"""Minimal PDF text extraction (and a matching writer for fixtures).

The north-rule pipeline parses "page images/PDFs"; the reference
delegates PDFs to the external pero_ocr stack, so this is a
from-scratch, dependency-free re-expression of the *digital-text* PDF
path: documents whose pages carry real text operators (the common case
for web-crawled PDFs) are parsed directly — no rasterization, no OCR,
confidence 1.0 per line.

Supported subset (deliberately small, honestly bounded):

* classic (non-objstm) PDF bodies: ``obj … stream … endstream``;
* uncompressed and ``/FlateDecode`` content streams (zlib only — the
  filter virtually all text PDFs use);
* text operators ``BT/ET``, ``Tj``, ``TJ``, ``'``, ``"``, with line
  structure from ``Td``/``TD``/``T*``; literal strings with the full
  escape set (octal, nesting, line continuations) and hex strings.

Anything outside the subset (encrypted files, object streams, exotic
filters, CID font encodings) raises :class:`PdfError`, which the
kernel maps to ``INVALID_FILE`` — one bad file never kills a task.

:func:`encode_text_pdf` writes a valid single-page PDF 1.4 with a
Flate-compressed content stream — used by the synthetic corpus so the
extractor is exercised against independently-constructed bytes, and
readable by any standard viewer (the fixture is a real PDF, not a
private format).
"""

from __future__ import annotations

import re
import zlib

from pero_ocr_api_spark.ocr.layout import Block, Line

PAGE_W, PAGE_H = 612, 792  # US Letter, PDF default user space
_FONT_SIZE = 12
_LEADING = 14
_MARGIN = 72


class PdfError(ValueError):
    pass


# ------------------------------------------------------------- writer ---


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_text_pdf(lines: list[str]) -> bytes:
    """One-page PDF 1.4 carrying `lines` as Helvetica text, content
    stream Flate-compressed, valid xref — deterministic bytes."""
    ops = [f"BT /F1 {_FONT_SIZE} Tf {_MARGIN} {PAGE_H - _MARGIN} Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(f"0 -{_LEADING} Td")
        ops.append(f"({_escape(line)}) Tj")
    ops.append("ET")
    content = zlib.compress(" ".join(ops).encode("latin-1"), 9)

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        ).encode(),
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (n, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ------------------------------------------------------------ extractor ---

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")


def _raw_streams(data: bytes) -> list[tuple[bytes, bytes]]:
    """(dict text, stream bytes) for every stream object. Stream bytes
    are sliced by /Length when it is a literal integer (robust against
    'endstream' inside binary data), else by the next 'endstream'.

    EOL stripping is applied ONLY when the boundary was found by
    scanning for 'endstream' — there the trailing \\r\\n belongs to the
    surrounding markup. A /Length-verified slice is exact and is
    returned unmodified: a compressed payload may legitimately end in
    0x0A/0x0D, and stripping it would corrupt ~1.5% of Flate streams."""
    out = []
    for m in _STREAM_RE.finditer(data):
        d = m.group(1)
        start = m.end()
        exact = False
        lm = _LENGTH_RE.search(d)
        if lm:
            end = start + int(lm.group(1))
            exact = data[end : end + 32].lstrip()[:9] == b"endstream"
            if not exact:
                end = data.find(b"endstream", start)
        else:
            end = data.find(b"endstream", start)
        if end < 0:
            raise PdfError("unterminated stream")
        raw = data[start:end]
        out.append((d, raw if exact else raw.rstrip(b"\r\n")))
    return out


def _decode_stream(dict_text: bytes, raw: bytes) -> bytes:
    if b"/Filter" not in dict_text:
        return raw
    if b"/FlateDecode" in dict_text:
        try:
            return zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfError(f"bad Flate stream: {exc}") from exc
    raise PdfError("unsupported stream filter")


def _read_string(s: str, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at s[i] == '(' — returns
    (decoded text, index past the closing paren)."""
    assert s[i] == "("
    i += 1
    depth = 1
    out: list[str] = []
    esc = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in esc:
                out.append(esc[e])
                i += 1
            elif e in "()\\":
                out.append(e)
                i += 1
            elif e in "01234567":
                oct_digits = ""
                while i < n and s[i] in "01234567" and len(oct_digits) < 3:
                    oct_digits += s[i]
                    i += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in "\r\n":  # line continuation
                i += 1
                if e == "\r" and i < n and s[i] == "\n":
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == "(":
            depth += 1
            out.append(c)
            i += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise PdfError("unterminated string literal")


_NUM_RE = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(r"[A-Za-z'\"*][A-Za-z0-9'\"*]*")


def _tokens(s: str):
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in " \t\r\n\x00\x0c":
            i += 1
        elif c == "(":
            text, i = _read_string(s, i)
            yield ("str", text)
        elif c == "[":
            yield ("larr", None)
            i += 1
        elif c == "]":
            yield ("rarr", None)
            i += 1
        elif c == "<" and i + 1 < n and s[i + 1] == "<":
            i += 2
        elif c == ">" and i + 1 < n and s[i + 1] == ">":
            i += 2
        elif c == "<":
            j = s.find(">", i)
            if j < 0:
                raise PdfError("unterminated hex string")
            hx = re.sub(r"\s", "", s[i + 1 : j])
            if len(hx) % 2:
                hx += "0"
            yield ("str", bytes.fromhex(hx).decode("latin-1"))
            i = j + 1
        elif c == "/":
            m = re.match(r"/[^\s()<>\[\]/]*", s[i:])
            i += m.end()
        elif c == "%":  # comment to end of line
            j = i
            while j < n and s[j] not in "\r\n":
                j += 1
            i = j
        else:
            m = _NUM_RE.match(s, i)
            if m and m.end() > i:
                i = m.end()
                yield ("num", None)
                continue
            m = _OP_RE.match(s, i)
            if not m:
                raise PdfError(f"unparseable content byte {c!r}")
            i = m.end()
            yield ("op", m.group(0))


def _text_from_content(content: str, lines: list[str]) -> None:
    cur: list[str] = []
    strs: list[str] = []  # string operands since last consume
    arr_mark = -1

    def newline():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    in_text = False
    for kind, val in _tokens(content):
        if kind == "op" and val == "BT":
            in_text = True
        elif kind == "op" and val == "ET":
            in_text = False
            newline()
            strs.clear()
        elif not in_text:
            strs.clear()
        elif kind == "str":
            strs.append(val)
        elif kind == "larr":
            arr_mark = len(strs)
        elif kind == "rarr":
            joined = "".join(strs[arr_mark:]) if arr_mark >= 0 else ""
            del strs[arr_mark if arr_mark >= 0 else len(strs) :]
            strs.append(joined)
            arr_mark = -1
        elif kind == "op":
            if val in ("Td", "TD", "T*"):
                newline()
            elif val == "Tj" or val == "TJ":
                if strs:
                    cur.append(strs[-1])
            elif val in ("'", '"'):
                newline()
                if strs:
                    cur.append(strs[-1])
            strs.clear()
    newline()


def _encrypted(data: bytes) -> bool:
    """/Encrypt declared where the spec puts it: in the trailer
    dictionary (classic files) or the xref-stream dictionary (1.5+
    files). A whole-file substring scan would false-positive on valid
    PDFs whose *content* contains the text '/Encrypt'; when neither
    region exists the file has no xref at all (hand-built subset
    bodies) and the conservative whole-file scan applies."""
    t = data.rfind(b"trailer")
    if t >= 0:
        return b"/Encrypt" in data[t:]
    xm = None
    for xm in re.finditer(rb"/Type\s*/XRef\b", data):
        pass
    if xm is not None:
        # the xref-stream dict: from the enclosing 'obj' keyword to
        # the 'stream' keyword that opens its data
        o = data.rfind(b"obj", 0, xm.start())
        s = data.find(b"stream", xm.end())
        return b"/Encrypt" in data[max(o, 0) : s if s >= 0 else len(data)]
    return b"/Encrypt" in data


def extract_text(data: bytes) -> list[str]:
    """Text lines of a digital-text PDF, reading order (subset above)."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    if _encrypted(data):
        raise PdfError("encrypted PDF unsupported")
    lines: list[str] = []
    saw_content = False
    for dict_text, raw in _raw_streams(data):
        decoded = _decode_stream(dict_text, raw)
        try:
            content = decoded.decode("latin-1")
        except UnicodeDecodeError as exc:  # pragma: no cover — latin-1 total
            raise PdfError(str(exc)) from exc
        if "BT" not in content:
            continue
        saw_content = True
        _text_from_content(content, lines)
    if not saw_content:
        raise PdfError("no text content streams found")
    return lines


def to_blocks(lines: list[str]) -> list[Block]:
    """Digital-text lines as one layout Block with synthetic geometry
    (leading-spaced baselines inside the letter page box), confidence
    1.0 per line — so PDFs flow through the same confidence filter,
    normalization, and ALTO/PAGE/txt exports as OCR'd pages."""
    if not lines:
        return []
    ls = [
        Line(
            text=t,
            confidence=1.0,
            y0=_MARGIN + i * _LEADING,
            x0=_MARGIN,
            h=_FONT_SIZE,
            w=max(7 * len(t), 1),
        )
        for i, t in enumerate(lines)
    ]
    y1 = _MARGIN + len(lines) * _LEADING
    x1 = _MARGIN + max(line.w for line in ls)
    return [Block(y0=_MARGIN, x0=_MARGIN, y1=y1, x1=x1, lines=ls)]
