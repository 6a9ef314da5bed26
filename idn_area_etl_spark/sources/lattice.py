"""Minimal lattice-PDF table transcriber (pure Python, stdlib only).

The built-in fallback table parser for the PDF source
(`sources/pdf.py`): where camelot is installed the source prefers it,
but for Ghostscript-flattened lattice PDFs — FlateDecode content
streams, simple-font Tj/TJ text with ToUnicode CMaps, ruled table
lines drawn as `m/l/S` paths, exactly the shape of the reference's
golden fixture (`tests/fixtures/target_tables.pdf`, reference
test_e2e.py:24-91) — this module re-derives what camelot's lattice
parser would hand the extractors with zero dependencies: per-page
cell grids `grid[row][col] = text` (multi-line cell text joined with
'\\n', the shape ``fix_wrapped_name`` expects).

Scope is deliberately the lattice subset (no xref walking — objects
are located by scanning; no CID fonts; no rotation); anything fancier
belongs to camelot on the executors.
"""

from __future__ import annotations

import re
import zlib
from collections import defaultdict
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# Object extraction
# ---------------------------------------------------------------------------


def _objects(data: bytes) -> dict[int, bytes]:
    """Top-level `N 0 obj ... endobj` bodies, plus objects inlined in
    /ObjStm object streams (pairs of (num, offset) then bodies)."""
    objs: dict[int, bytes] = {}
    for num, body in re.findall(rb"(\d+) 0 obj(.*?)endobj", data, re.S):
        objs[int(num)] = body
    for num, body in list(objs.items()):
        if b"/ObjStm" not in body:
            continue
        stream = _stream_of(body)
        first = int(re.search(rb"/First (\d+)", body).group(1))
        header = stream[:first].split()
        pairs = [
            (int(header[i]), int(header[i + 1]))
            for i in range(0, len(header), 2)
        ]
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(stream) - first
            objs[onum] = stream[first + off : first + end]
    return objs


def _stream_of(body: bytes) -> bytes:
    m = re.search(rb"stream\r?\n(.*?)endstream", body, re.S)
    if m is None:
        raise ValueError(
            "object has no stream data — PDF is outside the lattice "
            "transcriber's scope (install camelot for general PDFs)"
        )
    raw = m.group(1)
    if b"/FlateDecode" in body:
        return zlib.decompress(raw)
    return raw


# ---------------------------------------------------------------------------
# ToUnicode CMaps
# ---------------------------------------------------------------------------


def _parse_cmap(stream: bytes) -> dict[int, str]:
    text = stream.decode("latin1")
    out: dict[int, str] = {}
    for block in re.findall(
        r"beginbfchar(.*?)endbfchar", text, re.S
    ):
        for src, dst in re.findall(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block):
            out[int(src, 16)] = "".join(
                chr(int(dst[i : i + 4], 16)) for i in range(0, len(dst), 4)
            )
    for block in re.findall(r"beginbfrange(.*?)endbfrange", text, re.S):
        for lo, hi, dst in re.findall(
            r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block
        ):
            base = int(dst, 16)
            for code in range(int(lo, 16), int(hi, 16) + 1):
                out[code] = chr(base + code - int(lo, 16))
    return out


@dataclass
class Font:
    cmap: dict[int, str]
    first_char: int
    widths: list[float]
    default_width: float = 500.0

    def decode(self, raw: bytes) -> str:
        return "".join(self.cmap.get(b, chr(b)) for b in raw)

    def width(self, code: int) -> float:
        i = code - self.first_char
        if 0 <= i < len(self.widths) and self.widths[i] > 0:
            return self.widths[i]
        return self.default_width


def _fonts_for_page(
    objs: dict[int, bytes], page_body: bytes
) -> dict[str, Font]:
    m = re.search(rb"/Font (\d+) 0 R", page_body)
    font_dict = objs[int(m.group(1))] if m else page_body
    fonts: dict[str, Font] = {}
    for name, ref in re.findall(rb"/(R\d+) (\d+) 0 R", font_dict):
        fbody = objs[int(ref)]
        tum = re.search(rb"/ToUnicode (\d+) 0 R", fbody)
        cmap = _parse_cmap(_stream_of(objs[int(tum.group(1))])) if tum else {}
        fc = re.search(rb"/FirstChar (\d+)", fbody)
        first_char = int(fc.group(1)) if fc else 0
        wm = re.search(rb"/Widths \[([^\]]*)\]", fbody)
        widths = (
            [float(w) for w in wm.group(1).split()] if wm else []
        )
        fonts[name.decode()] = Font(cmap, first_char, widths)
    return fonts


# ---------------------------------------------------------------------------
# Content-stream interpretation (text runs + ruled lines)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # literal string
    rb"|\[|\]"
    rb"|/[A-Za-z0-9#]+"
    rb"|-?\d*\.?\d+"
    rb"|[A-Za-z'\"*]+"
)


def _unescape(s: bytes) -> bytes:
    out = bytearray()
    i = 1
    while i < len(s) - 1:
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            n = s[i : i + 1]
            mapping = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                       b"(": b"(", b")": b")", b"\\": b"\\"}
            if n in mapping:
                out += mapping[n]
            elif n.isdigit():
                oct_digits = s[i : i + 3]
                k = 0
                while k < 3 and k < len(oct_digits) and chr(oct_digits[k]).isdigit():
                    k += 1
                out.append(int(s[i : i + k], 8))
                i += k - 1
            else:
                out += n
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


@dataclass
class Run:
    x: float
    y: float
    text: str
    size: float
    end_x: float = 0.0


@dataclass
class PageContent:
    runs: list[Run] = field(default_factory=list)
    vlines: list[tuple[float, float, float]] = field(default_factory=list)
    hlines: list[tuple[float, float, float]] = field(default_factory=list)


def _interpret(stream: bytes, fonts: dict[str, Font]) -> PageContent:
    pc = PageContent()
    scale = 1.0  # from `s 0 0 s 0 0 cm`
    tm_x = tm_y = 0.0   # text-line origin
    cur_x = cur_y = 0.0
    leading = 0.0
    font: Font | None = None
    size = 0.0
    stack: list[float] = []
    operands: list[object] = []
    path: list[tuple[float, float]] = []
    path_ops: list[str] = []
    rects: list[tuple[float, float, float, float]] = []

    def emit(raw: bytes) -> None:
        nonlocal cur_x
        assert font is not None
        text = font.decode(_unescape(raw))
        start = cur_x
        for b in _unescape(raw):
            cur_x += font.width(b) / 1000.0 * size
        pc.runs.append(Run(start, cur_y, text, size, cur_x))

    for tok in _TOKEN.finditer(stream):
        t = tok.group(0)
        if t.startswith(b"("):
            operands.append(t)
        elif t == b"[" or t == b"]":
            operands.append(t)
        elif t.startswith(b"/"):
            operands.append(t)
        elif re.fullmatch(rb"-?\d*\.?\d+", t):
            operands.append(float(t))
        else:
            op = t.decode("latin1")
            if op == "cm":
                # fixture only uses uniform `s 0 0 s 0 0 cm`; compose
                if len(operands) >= 6 and isinstance(operands[-6], float):
                    scale *= operands[-6]
            elif op == "q":
                stack.append(scale)
            elif op == "Q":
                if stack:
                    scale = stack.pop()
            elif op == "m":
                path.append((operands[-2] * scale, operands[-1] * scale))
                path_ops.append("m")
            elif op == "l":
                path.append((operands[-2] * scale, operands[-1] * scale))
                path_ops.append("l")
            elif op in ("S", "s"):
                for (rx, ry, rw, rh) in rects:
                    pc.vlines.append((rx, ry, ry + rh))
                    pc.vlines.append((rx + rw, ry, ry + rh))
                    pc.hlines.append((ry, rx, rx + rw))
                    pc.hlines.append((ry + rh, rx, rx + rw))
                rects = []
                for i in range(1, len(path)):
                    if path_ops[i] != "l":
                        continue
                    (x1, y1), (x2, y2) = path[i - 1], path[i]
                    if abs(x1 - x2) < 0.3:
                        pc.vlines.append((x1, min(y1, y2), max(y1, y2)))
                    elif abs(y1 - y2) < 0.3:
                        pc.hlines.append((y1, min(x1, x2), max(x1, x2)))
                path, path_ops = [], []
            elif op == "re":
                rects.append(
                    (operands[-4] * scale, operands[-3] * scale,
                     operands[-2] * scale, operands[-1] * scale)
                )
            elif op in ("f", "n", "W", "w", "RG", "rg", "g", "G", "gs"):
                if op in ("f", "n"):
                    path, path_ops, rects = [], [], []
            elif op == "BT":
                tm_x = tm_y = cur_x = cur_y = 0.0
            elif op == "Tf":
                fname = operands[-2]
                size = operands[-1]
                font = fonts.get(fname[1:].decode())
            elif op == "Tm":
                tm_x, tm_y = operands[-2], operands[-1]
                cur_x, cur_y = tm_x, tm_y
            elif op == "Td":
                tm_x += operands[-2]
                tm_y += operands[-1]
                cur_x, cur_y = tm_x, tm_y
            elif op == "TD":
                leading = -operands[-1]
                tm_x += operands[-2]
                tm_y += operands[-1]
                cur_x, cur_y = tm_x, tm_y
            elif op == "TL":
                leading = operands[-1]
            elif op == "T*":
                tm_y -= leading
                cur_x, cur_y = tm_x, tm_y
            elif op == "Tj":
                emit(operands[-1])
            elif op == "'":
                tm_y -= leading
                cur_x, cur_y = tm_x, tm_y
                emit(operands[-1])
            elif op == "TJ":
                # operands: [ ... ] mix of strings and kern numbers
                start = len(operands) - 1 - operands[::-1].index(b"[")
                for el in operands[start + 1 :]:
                    if isinstance(el, float):
                        cur_x -= el / 1000.0 * size
                    elif isinstance(el, bytes) and el.startswith(b"("):
                        emit(el)
            operands = []
    return pc


# ---------------------------------------------------------------------------
# Lattice cell assembly
# ---------------------------------------------------------------------------


def _cluster(values: list[float], tol: float = 2.0) -> list[float]:
    out: list[float] = []
    for v in sorted(values):
        if not out or v - out[-1] > tol:
            out.append(v)
        else:
            out[-1] = (out[-1] + v) / 2.0
    return out


def page_grid(pc: PageContent) -> list[list[str]]:
    """Build the ruled-cell grid and drop each text run into its cell,
    camelot-style: text outside the table bbox is dropped; a run whose
    cell lacks a left/top border (spanning cell) shifts left then up to
    the span's anchor cell (camelot's default shift_text=['l','t']);
    runs in one cell group into lines by y, lines join with '\\n'."""
    xs = _cluster([v[0] for v in pc.vlines])
    ys = _cluster([h[0] for h in pc.hlines])
    if len(xs) < 2 or len(ys) < 2:
        return []
    ys_desc = sorted(ys, reverse=True)
    n_rows, n_cols = len(ys_desc) - 1, len(xs) - 1

    def col_of(x: float) -> int:
        for c in range(n_cols):
            if x < xs[c + 1]:
                return c
        return n_cols - 1

    def row_of(y: float) -> int:
        for r in range(n_rows):
            if y > ys_desc[r + 1]:
                return r
        return n_rows - 1

    def has_top_border(r: int, c: int) -> bool:
        if r == 0:
            return True
        y = ys_desc[r]
        mid = (xs[c] + xs[c + 1]) / 2.0
        return any(
            abs(hy - y) < 2.5 and hx1 - 1 <= mid <= hx2 + 1
            for hy, hx1, hx2 in pc.hlines
        )

    def has_left_border(r: int, c: int) -> bool:
        if c == 0:
            return True
        x = xs[c]
        mid = (ys_desc[r] + ys_desc[r + 1]) / 2.0
        return any(
            abs(vx - x) < 2.5 and vy1 - 1 <= mid <= vy2 + 1
            for vx, vy1, vy2 in pc.vlines
        )

    # pdfminer-style line assembly BEFORE cell assignment: runs on one
    # baseline merge while the gap is under ~2 average char widths
    # (char_margin), with a space inserted for word-sized gaps — the
    # merged line is then assigned as ONE unit by its bbox midpoint
    # (this is why camelot lands '1 Keude Bakongan' in a single cell).
    baselines: dict[float, list[Run]] = defaultdict(list)
    ykeys = _cluster([r.y for r in pc.runs], tol=1.0)
    for run in pc.runs:
        baselines[min(ykeys, key=lambda ky: abs(ky - run.y))].append(run)
    merged: list[Run] = []
    for by, runs in baselines.items():
        cur: Run | None = None
        for rn in sorted(runs, key=lambda r: r.x):
            if cur is not None and rn.x - cur.end_x < cur.size:
                sep = " " if rn.x - cur.end_x > cur.size * 0.17 else ""
                cur = Run(
                    cur.x, cur.y, cur.text + sep + rn.text, cur.size,
                    max(cur.end_x, rn.end_x),
                )
            else:
                if cur is not None:
                    merged.append(cur)
                cur = Run(rn.x, rn.y, rn.text, rn.size, rn.end_x)
        if cur is not None:
            merged.append(cur)

    cells: dict[tuple[int, int], list[Run]] = defaultdict(list)
    for run in merged:
        if not run.text.strip():
            continue
        # bbox midpoints for banding (baseline + ~half an x-height)
        ry = run.y + run.size * 0.35
        rx = (run.x + run.end_x) / 2.0
        if not (ys_desc[-1] < ry < ys_desc[0] and xs[0] < rx < xs[-1]):
            continue  # outside the table bbox (titles, page furniture)
        r, c = row_of(ry), col_of(rx)
        while not has_left_border(r, c):
            c -= 1
        while not has_top_border(r, c):
            r -= 1
        cells[(r, c)].append(run)

    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for (r, c), runs in cells.items():
        line_ys = _cluster([rn.y for rn in runs], tol=2.5)
        lines: dict[float, list[Run]] = defaultdict(list)
        for rn in runs:
            key = min(line_ys, key=lambda ly: abs(ly - rn.y))
            lines[key].append(rn)
        parts: list[str] = []
        for ly in sorted(lines, reverse=True):
            lruns = sorted(lines[ly], key=lambda rn: rn.x)
            buf = ""
            prev_end = None
            for rn in lruns:
                if prev_end is not None and rn.x - prev_end > rn.size * 0.17:
                    buf += " "
                buf += rn.text
                prev_end = rn.end_x
            parts.append(buf)
        grid[r][c] = "\n".join(parts)
    return grid


def count_pages(pdf_path: str) -> int:
    """Stdlib page-count probe (the pypdf-free fallback for S2):
    number of ``/Type /Page`` leaf objects (robust to nested page
    trees, where counting one ``/Kids`` array would undercount); falls
    back to the root ``/Kids`` length for page objects inlined beyond
    the object scan's reach.

    ``stream…endstream`` spans are stripped (non-greedily) before the
    match, which GREATLY REDUCES — but does not eliminate — the chance
    that marker bytes inside compressed/binary stream data overcount:
    if the byte sequence ``endstream`` itself occurs inside a stream's
    compressed payload, the strip stops early and the residual tail is
    still scanned.  Honoring each stream dictionary's ``/Length`` would
    close that; at this fallback's scope (the reference's fixture-class
    PDFs) the non-greedy strip has been sufficient.  (pypdf, when
    installed, walks the page tree and never sees stream payloads.)"""
    objs = _objects(open(pdf_path, "rb").read())
    n = sum(
        1
        for body in objs.values()
        if re.search(
            rb"/Type\s*/Page(?![a-zA-Z])",
            re.sub(rb"stream\r?\n.*?endstream", b"", body, flags=re.S),
        )
    )
    if n:
        return n
    kids_m = re.search(rb"/Kids \[([^\]]*)\]", b"".join(objs.values()))
    if kids_m is None:
        raise ValueError(f"no page tree found in {pdf_path}")
    return len(re.findall(rb"(\d+) 0 R", kids_m.group(1)))


def transcribe(
    pdf_path: str, pages: list[int] | None = None
) -> list[tuple[int, int, list[list[str]]]]:
    """PDF → [(page_no, table_no, grid), ...] in reading order.

    ``pages`` (1-based) restricts which pages' content streams are
    interpreted — the expensive step — so a chunked caller pays only
    for its own pages, not the whole document, per call.

    Raises ``ValueError`` (not a cryptic AttributeError) when the PDF
    is outside the flattened-lattice scope this parser handles.
    """
    data = open(pdf_path, "rb").read()
    objs = _objects(data)
    page_objs: list[tuple[int, int]] = []  # (page_obj_num, contents_num)
    kids_m = re.search(rb"/Kids \[([^\]]*)\]", b"".join(objs.values()))
    if kids_m is None:
        raise ValueError(
            f"no page tree found in {pdf_path} — outside the lattice "
            "transcriber's scope (install camelot for general PDFs)"
        )
    kid_nums = [int(n) for n in re.findall(rb"(\d+) 0 R", kids_m.group(1))]
    for kid in kid_nums:
        cm = re.search(rb"/Contents (\d+) 0 R", objs.get(kid, b""))
        if cm is None:
            raise ValueError(
                f"page object {kid} has no direct /Contents reference — "
                "outside the lattice transcriber's scope (install "
                "camelot for general PDFs)"
            )
        page_objs.append((kid, int(cm.group(1))))

    wanted = set(pages) if pages is not None else None
    out: list[tuple[int, int, list[list[str]]]] = []
    for page_no, (page_obj, contents) in enumerate(page_objs, start=1):
        if wanted is not None and page_no not in wanted:
            continue
        fonts = _fonts_for_page(objs, objs[page_obj])
        pc = _interpret(_stream_of(objs[contents]), fonts)
        grid = page_grid(pc)
        if grid:
            out.append((page_no, 0, grid))
    return out


