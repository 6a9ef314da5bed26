"""CLI shim: the stdlib lattice-PDF transcriber now lives in the
package (idn_area_etl_spark/sources/lattice.py) as the camelot-free
fallback parser of the PDF source.  This keeps the old tool entry
point working:

    python tools/pdf_lattice.py fixture.pdf [out.json]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idn_area_etl_spark.sources.lattice import (  # noqa: E402,F401
    count_pages,
    page_grid,
    transcribe,
)

if __name__ == "__main__":
    import json

    grids = transcribe(sys.argv[1])
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            json.dump(grids, fh, ensure_ascii=False)
    else:
        for page, tno, grid in grids:
            print(f"== page {page} table {tno}: {len(grid)}x{len(grid[0])}")
            for row in grid[:8]:
                print(row)
