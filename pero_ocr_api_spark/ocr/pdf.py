"""Minimal PDF text extraction (and a matching writer for fixtures).

The north-rule pipeline parses "page images/PDFs"; the reference
delegates PDFs to the external pero_ocr stack, so this is a
from-scratch, dependency-free re-expression of the *digital-text* PDF
path: documents whose pages carry real text operators (the common case
for web-crawled PDFs) are parsed directly — no rasterization, no OCR,
confidence 1.0 per line.

Supported subset (deliberately small, honestly bounded):

* classic PDF bodies: ``obj … stream … endstream``;
* PDF 1.5+ files whose document dictionaries live in object streams
  (``/Type /ObjStm``) with a cross-reference stream (``/Type /XRef``)
  instead of a classic table — the layout modern writers emit. The
  spec forbids *streams* inside object streams, so page content
  always stays a classic stream object; ObjStm bodies are decoded and
  structurally validated (N/First header), XRef streams are
  recognized and skipped;
* uncompressed, ``/FlateDecode``, ``/LZWDecode`` (variable-width
  9-12 bit codes, EarlyChange honored), ``/ASCIIHexDecode``,
  ``/ASCII85Decode``, and ``/RunLengthDecode`` streams, including
  filter cascades (``[/ASCIIHexDecode /FlateDecode]``) applied in
  array order;
* ``/DecodeParms`` predictors on Flate/LZW streams: PNG predictors 10-15
  (None/Sub/Up/Average/Paeth per row, the layout every modern writer
  uses for XRef streams and many use for content) and TIFF predictor
  2 at 8 bits per component;
* text operators ``BT/ET``, ``Tj``, ``TJ``, ``'``, ``"``, with line
  structure from ``Td``/``TD``/``T*``; literal strings with the full
  escape set (octal, nesting, line continuations) and hex strings.

Scanned PDFs — pages that are raster images, not text operators — are
handled by :func:`extract_page_images`: ``/Subtype /Image`` XObjects
that are 8-bit ``/DeviceGray``, either ``/Filter /DCTDecode``
(baseline grayscale JPEG, decoded by ocr/jpeg.py) or a text-subset
filter chain yielding raw samples; the kernel falls back to this path
(and the raster OCR stages) when a PDF has no extractable text.

Anything outside the subset (encrypted files, JBIG2/CCITT image
filters, color/progressive DCT, CID font encodings) raises
:class:`PdfError`, which the kernel maps to ``INVALID_FILE`` — one bad
file never kills a task.

:func:`encode_text_pdf` writes a valid single-page PDF 1.4 with a
Flate-compressed content stream — used by the synthetic corpus so the
extractor is exercised against independently-constructed bytes, and
readable by any standard viewer (the fixture is a real PDF, not a
private format). :func:`encode_text_pdf_hex` (ASCIIHex, optionally
cascaded with Flate), :func:`encode_text_pdf_a85` (ASCII85, optionally
cascaded), :func:`encode_text_pdf_rle` (RunLength),
:func:`encode_text_pdf_lzw` (LZW),
:func:`encode_text_pdf_pred` (Flate + PNG-Up predictor 12), and
:func:`encode_text_pdf_objstm` (PDF 1.5 ObjStm + XRef stream) write
the widened-subset fixtures.
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


class NoTextPdfError(PdfError):
    """Structurally valid PDF with no text content streams — the
    typed scanned-PDF signal the kernel routes on (never matched by
    message text, review finding)."""


# ------------------------------------------------------------- writer ---


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_ops(lines: list[str]) -> bytes:
    ops = [f"BT /F1 {_FONT_SIZE} Tf {_MARGIN} {PAGE_H - _MARGIN} Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(f"0 -{_LEADING} Td")
        ops.append(f"({_escape(line)}) Tj")
    ops.append("ET")
    return " ".join(ops).encode("latin-1")


def encode_text_pdf(lines: list[str]) -> bytes:
    """One-page PDF 1.4 carrying `lines` as Helvetica text, content
    stream Flate-compressed, valid xref — deterministic bytes."""
    return _classic_filtered_pdf(
        b"/FlateDecode", zlib.compress(_content_ops(lines), 9)
    )


def _hexlify(data: bytes, width: int = 64) -> bytes:
    hx = data.hex().encode("ascii")
    rows = [hx[i : i + width] for i in range(0, len(hx), width)]
    return b"\n".join(rows) + b">"


def encode_text_pdf_hex(lines: list[str], cascade: bool = False) -> bytes:
    """One-page PDF 1.4 whose content stream is /ASCIIHexDecode —
    either hex of the raw operators, or (``cascade=True``) the
    ``[/ASCIIHexDecode /FlateDecode]`` filter array: on-disk bytes are
    hex(deflate(ops)), decoded left-to-right per spec."""
    ops = _content_ops(lines)
    payload = _hexlify(zlib.compress(ops, 9) if cascade else ops)
    filt = (
        b"[/ASCIIHexDecode /FlateDecode]" if cascade else b"/ASCIIHexDecode"
    )
    return _classic_filtered_pdf(filt, payload)


def _a85_encode(data: bytes) -> bytes:
    """PDF-variant ASCII85 (no leading ``<~``): 4 bytes → 5 chars in
    ``!``..``u``, all-zero full groups as ``z``, partial final group
    of n bytes → n+1 chars, ``~>`` EOD."""
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        n = len(chunk)
        v = int.from_bytes(chunk + b"\0" * (4 - n), "big")
        if v == 0 and n == 4:
            out += b"z"
            continue
        digits = bytearray(5)
        for j in range(4, -1, -1):
            digits[j] = 0x21 + v % 85
            v //= 85
        out += digits[: n + 1]
    return bytes(out) + b"~>"


def _rle_encode(data: bytes) -> bytes:
    """PDF RunLengthDecode inverse: replicate runs (2-128 equal bytes)
    as (257-count, byte), literal runs (1-128 bytes) as (count-1,
    bytes), 128 EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j + 1 < len(data) and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:
            k = i
            while (
                k < len(data)
                and k - i < 128
                and not (k + 1 < len(data) and data[k] == data[k + 1])
            ):
                k += 1
            out.append(k - i - 1)
            out += data[i:k]
            i = k
    out.append(128)
    return bytes(out)


def _assemble_pdf(objs: list[bytes]) -> bytes:
    """Serialize numbered body dicts into a classic PDF 1.4: objects,
    xref table, trailer (/Root = object 1) — the shared tail of every
    classic fixture writer."""
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


def _classic_filtered_pdf(
    filt: bytes, payload: bytes, parms: bytes | None = None
) -> bytes:
    """Assemble the standard 5-object single-page PDF 1.4 around an
    already-encoded content payload with the given /Filter value (and
    optional /DecodeParms dict) — shared by the widened-subset fixture
    writers."""
    parms_part = b" /DecodeParms %s" % parms if parms else b""
    return _assemble_pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} "
                f"{PAGE_H}] /Contents 4 0 R /Resources "
                f"<< /Font << /F1 5 0 R >> >> >>"
            ).encode(),
            b"<< /Length %d /Filter %s%s >>\nstream\n%s\nendstream"
            % (len(payload), filt, parms_part, payload),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ]
    )


def encode_text_pdf_a85(lines: list[str], cascade: bool = False) -> bytes:
    """One-page PDF 1.4 whose content stream is /ASCII85Decode — either
    base-85 of the raw operators, or (``cascade=True``) the
    ``[/ASCII85Decode /FlateDecode]`` array (base-85 of deflate)."""
    ops = _content_ops(lines)
    payload = _a85_encode(zlib.compress(ops, 9) if cascade else ops)
    filt = b"[/ASCII85Decode /FlateDecode]" if cascade else b"/ASCII85Decode"
    return _classic_filtered_pdf(filt, payload)


def encode_text_pdf_rle(lines: list[str]) -> bytes:
    """One-page PDF 1.4 whose content stream is /RunLengthDecode."""
    return _classic_filtered_pdf(
        b"/RunLengthDecode", _rle_encode(_content_ops(lines))
    )


def _png_up_predict(data: bytes, columns: int) -> bytes:
    """Forward PNG Up (filter type 2) rows — the encoder side of the
    predictor-12 layout modern PDF writers emit."""
    out = bytearray()
    prev = bytes(columns)
    for start in range(0, len(data), columns):
        row = data[start : start + columns]
        out.append(2)
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(len(row)))
        prev = row
    return bytes(out)


def encode_text_pdf_lzw(lines: list[str]) -> bytes:
    """One-page PDF 1.4 whose content stream is /LZWDecode
    (EarlyChange=1, the default every real writer uses)."""
    return _classic_filtered_pdf(b"/LZWDecode", _lzw_encode(_content_ops(lines)))


def encode_text_pdf_pred(lines: list[str], columns: int = 24) -> bytes:
    """One-page PDF 1.4 whose Flate content stream carries
    ``/DecodeParms << /Predictor 12 /Columns N >>`` (PNG Up rows)."""
    ops = _content_ops(lines)
    payload = zlib.compress(_png_up_predict(ops, columns), 9)
    return _classic_filtered_pdf(
        b"/FlateDecode",
        payload,
        b"<< /Predictor 12 /Columns %d >>" % columns,
    )


def encode_text_pdf_pages(pages: list[list[str]]) -> bytes:
    """MULTI-page PDF 1.4: one /Page + one Flate content stream per
    page, kids in reading order — the extractor concatenates content
    streams in document order, so page N's lines follow page N-1's.
    Deterministic bytes, standard-viewer-valid xref."""
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3..2+n pages, 3+n..2+2n
    # contents, 3+2n font
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i in range(n_pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} "
                f"{PAGE_H}] /Contents {3 + n_pages + i} 0 R /Resources "
                f"<< /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
    for lines in pages:
        content = zlib.compress(_content_ops(lines), 9)
        objs.append(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(content), content)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_pdf(objs)


def encode_scanned_pdf(imgs: "list") -> bytes:
    """One PDF 1.4 page per image, each page drawing a baseline-JPEG
    ``/DCTDecode`` image XObject (8-bit /DeviceGray) — the SCANNED-PDF
    layout that is pero-ocr's home turf (a page raster wrapped in PDF,
    no text operators). Fixture writer for :func:`extract_page_images`;
    spec-valid, standard-viewer-renderable."""
    from pero_ocr_api_spark.ocr import jpeg as _jpeg

    n = len(imgs)
    if n < 1:
        raise ValueError("encode_scanned_pdf needs at least one image")
    # objects: 1 catalog, 2 pages, 3..2+n page dicts, 3+n..2+2n content
    # streams, 3+2n..2+3n image XObjects
    kids = " ".join(f"{3 + i} 0 R" for i in range(n))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
    ]
    for i, img in enumerate(imgs):
        h, w = img.shape
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
                f"/Contents {3 + n + i} 0 R /Resources "
                f"<< /XObject << /Im1 {3 + 2 * n + i} 0 R >> >> >>"
            ).encode()
        )
    for img in imgs:
        h, w = img.shape
        ops = f"q {w} 0 0 {h} 0 0 cm /Im1 Do Q".encode()
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(ops), ops)
        )
    for img in imgs:
        h, w = img.shape
        payload = _jpeg.encode_gray(img)
        objs.append(
            (
                f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                f"/Filter /DCTDecode /Length {len(payload)} >>"
            ).encode()
            + b"\nstream\n"
            + payload
            + b"\nendstream"
        )
    return _assemble_pdf(objs)


_SUBTYPE_RE = re.compile(rb"/Subtype\s*/([A-Za-z0-9]+)")
_WIDTH_RE = re.compile(rb"/Width\s+(\d+)\b")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)\b")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)\b")
_COLORSPACE_RE = re.compile(rb"/ColorSpace\s*/([A-Za-z0-9]+)")


def extract_page_images(data: bytes):
    """Page raster images of a scanned PDF, BYTE order: every
    ``/Subtype /Image`` XObject that is 8-bit ``/DeviceGray``, either
    ``/Filter /DCTDecode`` (baseline grayscale JPEG — ocr/jpeg.py) or
    any text-subset filter chain yielding raw samples. Returns a list
    of HxW uint8 arrays; raises :class:`PdfError` when the file has no
    decodable page image (or is outside the subset: color images,
    other bit depths, DCT cascades, encrypted files).

    Supported-subset contract (round-5 advice, documented rather than
    page-tree-walked): images are collected in raw byte/object order
    and ALL matching image XObjects count as page content. A scanner-
    produced PDF writes one full-page image per page in page order —
    the target of this fallback — so byte order == reading order
    there. A PDF whose objects are reordered, or which carries
    unreferenced decorative/thumbnail DeviceGray images, is outside
    the subset: correct handling would need the /Pages /Kids →
    /Resources walk this text-first parser does not implement."""
    import numpy as np

    from pero_ocr_api_spark.ocr import jpeg as _jpeg

    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    if _encrypted(data):
        raise PdfError("encrypted PDF unsupported")
    imgs = []
    for dict_text, raw in _raw_streams(data):
        sm = _SUBTYPE_RE.search(dict_text)
        if not sm or sm.group(1) != b"Image":
            continue
        wm, hm, bm = (
            _WIDTH_RE.search(dict_text),
            _HEIGHT_RE.search(dict_text),
            _BPC_RE.search(dict_text),
        )
        cm = _COLORSPACE_RE.search(dict_text)
        if not (wm and hm):
            raise PdfError("image XObject without /Width//Height")
        w, h = int(wm.group(1)), int(hm.group(1))
        if bm and int(bm.group(1)) != 8:
            raise PdfError("non-8-bit image outside subset")
        if cm and cm.group(1) != b"DeviceGray":
            raise PdfError("non-grayscale image outside subset")
        filters = _filters(dict_text)
        if filters and filters[-1] == b"DCTDecode":
            if len(filters) > 1:
                raise PdfError("DCTDecode filter cascade outside subset")
            try:
                img = _jpeg.decode_gray(raw)
            except _jpeg.JpegError as exc:
                raise PdfError(f"bad DCT image: {exc}") from exc
        else:
            samples = _decode_stream(dict_text, raw)
            if len(samples) != w * h:
                raise PdfError("image sample count mismatch")
            img = np.frombuffer(samples, dtype=np.uint8).reshape(h, w)
        if img.shape != (h, w):
            raise PdfError(
                f"image dims mismatch: dict {(h, w)} vs decoded {img.shape}"
            )
        imgs.append(img)
    if not imgs:
        raise PdfError("no page images found")
    return imgs


def encode_text_pdf_objstm(lines: list[str]) -> bytes:
    """One-page PDF 1.5: the document dictionaries (catalog, pages,
    page, font) packed into a Flate-compressed object stream (obj 6),
    the content stream as a classic object (obj 4 — the spec forbids
    streams inside object streams), and a cross-reference *stream*
    (obj 7, ``/Type /XRef``, ``/W [1 4 2]``) instead of a classic
    table — the layout PDF 1.5+ writers emit. Deterministic bytes."""
    content = zlib.compress(_content_ops(lines), 9)
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} "
                f"{PAGE_H}] /Contents 4 0 R /Resources << /Font "
                f"<< /F1 5 0 R >> >> >>"
            ).encode(),
        ),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    parts, offs, cur = [], [], 0
    for num, body in inner:
        offs.append((num, cur))
        parts.append(body)
        cur += len(body) + 1
    header = b" ".join(b"%d %d" % (n, o) for n, o in offs)
    objstm_plain = header + b"\n" + b" ".join(parts)
    first = len(header) + 1
    objstm = zlib.compress(objstm_plain, 9)

    out = bytearray(b"%PDF-1.5\n")
    offset_of: dict[int, int] = {}

    def _classic(num: int, body: bytes) -> None:
        offset_of[num] = len(out)
        out.extend(b"%d 0 obj\n%s\nendobj\n" % (num, body))

    _classic(
        4,
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(content), content),
    )
    _classic(
        6,
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n%s\nendstream"
        % (len(inner), first, len(objstm), objstm),
    )
    # xref stream rows, /W [1 4 2]: type, field2, field3
    xref_at_placeholder = len(out)  # obj 7 starts here
    rows = []
    objstm_index = {num: i for i, (num, _) in enumerate(inner)}
    for num in range(8):
        if num == 0:
            rows.append((0, 0, 65535))  # free head
        elif num in objstm_index:
            rows.append((2, 6, objstm_index[num]))  # in objstm 6
        elif num == 7:
            rows.append((1, xref_at_placeholder, 0))
        else:
            rows.append((1, offset_of[num], 0))
    table = b"".join(
        bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in rows
    )
    xref_data = zlib.compress(table, 9)
    _classic(
        7,
        b"<< /Type /XRef /Size 8 /Root 1 0 R /W [1 4 2] "
        b"/Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
        % (len(xref_data), xref_data),
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at_placeholder
    return bytes(out)


# ------------------------------------------------------------ extractor ---

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")


def _last_top_dict(full: bytes) -> bytes:
    """The LAST top-level ``<< ... >>`` body in a byte span.

    ``_STREAM_RE`` starts its dict capture at the first ``<<`` after
    the previous stream, so the captured span can include earlier
    NON-stream objects (a font dict between two streams is the common
    real-PDF layout) — keys like /Subtype or /Filter would then be
    read from the wrong object (review finding: a font's /Subtype
    /Type1 shadowed an image XObject's /Subtype /Image). A depth scan
    keeps only the stream's own dictionary.

    Robustness (second review finding): the capture can also traverse
    a previous stream's BINARY payload, where stray 0x3C3C/0x3E3E byte
    pairs are expected noise — depth is therefore clamped at 0 (a '>>'
    with no open dict is junk, not structure), so unbalanced garbage
    can never push the scan negative and starve the real dict; a stray
    unmatched '<<' merely widens the final span, which the first-match
    key regexes tolerate exactly as the pre-fix code did. Token
    positions come from one C-level finditer, not a per-byte loop."""
    depth = 0
    start = None
    last = None
    for m in re.finditer(rb"<<|>>", full):
        if m.group() == b"<<":
            if depth == 0:
                start = m.start()
            depth += 1
        else:
            if depth == 0:
                continue  # junk '>>' inside binary data — not structure
            depth -= 1
            if depth == 0 and start is not None:
                last = (start, m.end())
    return full[last[0] + 2 : last[1] - 2] if last else full


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
        d = _last_top_dict(b"<<" + m.group(1) + b">>")
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


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _filters(dict_text: bytes) -> list[bytes]:
    """Filter chain in application (decode) order: a bare name or an
    array of names, per spec applied left to right."""
    m = _FILTER_RE.search(dict_text)
    if not m:
        return []
    return re.findall(rb"/([A-Za-z0-9]+)", m.group(1))


def _ascii_hex_decode(raw: bytes) -> bytes:
    body = raw.split(b">")[0]  # '>' is the EOD marker
    hx = re.sub(rb"\s", b"", body)
    if len(hx) % 2:
        hx += b"0"  # spec: odd-length data implies a trailing 0
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise PdfError(f"bad ASCIIHex stream: {exc}") from exc


_A85_WS = frozenset(b" \t\r\n\f\x00")


def _ascii85_decode(raw: bytes) -> bytes:
    """PDF ASCII85: 5 chars ``!``..``u`` → 4 bytes (base 85), ``z`` =
    four zero bytes (full groups only), whitespace ignored, ``~>``
    EOD; a final partial group of n chars (2-4) is ``u``-padded and
    yields its first n-1 bytes. Out-of-range chars, a lone trailing
    char, or a group above 2^32-1 are outside the subset → PdfError."""
    body = raw.split(b"~>")[0]

    def group_bytes(g: list[int], nbytes: int) -> bytes:
        v = 0
        for d in g:
            v = v * 85 + d
        if v > 0xFFFFFFFF:
            raise PdfError("ASCII85: group exceeds 32 bits")
        return v.to_bytes(4, "big")[:nbytes]

    out = bytearray()
    group: list[int] = []
    for ch in body:
        if ch in _A85_WS:
            continue
        if ch == 0x7A:  # 'z'
            if group:
                raise PdfError("ASCII85: 'z' inside a group")
            out += b"\0\0\0\0"
            continue
        if not 0x21 <= ch <= 0x75:
            raise PdfError(f"ASCII85: invalid character {ch:#04x}")
        group.append(ch - 0x21)
        if len(group) == 5:
            out += group_bytes(group, 4)
            group = []
    if group:
        if len(group) == 1:
            raise PdfError("ASCII85: lone trailing character")
        n = len(group)
        group += [84] * (5 - n)  # pad with 'u'
        out += group_bytes(group, n - 1)
    return bytes(out)


def _lzw_decode(raw: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (spec 7.4.4 = TIFF LZW): variable-width codes
    9→12 bits packed MSB-first, 256 = clear-table, 257 = EOD.
    ``early`` is /DecodeParms /EarlyChange (default 1: the code width
    grows one code earlier than strictly necessary — what every real
    writer emits)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in raw:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise PdfError(f"LZW: code {code} out of range")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # EarlyChange=1 → grow at table size 2^w - 1 (decoder lags
            # the encoder's table by one, compensating its 2^w trigger)
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    raise PdfError("LZW: missing EOD marker")


def _lzw_encode(data: bytes) -> bytes:
    """LZW encoder (EarlyChange=1) for the fixture writer — emits
    clear-table / EOD markers and grows code width in lockstep with
    :func:`_lzw_decode`."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for i in range(len(data)):
        ch = data[i : i + 1]
        if w + ch in table:
            w += ch
            continue
        emit(table[w], width)
        table[w + ch] = next_code
        next_code += 1
        # in-loop the encoder's table is one entry AHEAD of the
        # decoder's at the same stream position, so EarlyChange=1
        # triggers at 2^w here vs 2^w - 1 on the decoder
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4095:
            emit(256, width)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        w = ch
    if w:
        emit(table[w], width)
        # final flush adds no entry — encoder and decoder tables are
        # level, so the EOD width uses the decoder-side trigger
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _run_length_decode(raw: bytes) -> bytes:
    """PDF RunLengthDecode: length byte L<128 → copy next L+1 bytes;
    L>128 → repeat next byte 257-L times; L=128 EOD (required)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        ln = raw[i]
        if ln == 128:
            return bytes(out)
        if ln < 128:
            chunk = raw[i + 1 : i + 2 + ln]
            if len(chunk) != ln + 1:
                raise PdfError("RunLength: truncated literal run")
            out += chunk
            i += 2 + ln
        else:
            if i + 1 >= len(raw):
                raise PdfError("RunLength: truncated replicate run")
            out += raw[i + 1 : i + 2] * (257 - ln)
            i += 2
    raise PdfError("RunLength: missing EOD marker")


_PARMS_RE = re.compile(rb"/(?:DecodeParms|DP)\s*(\[.*?\]|<<.*?>>|null)", re.S)
_PARM_INT_RES = {
    key: re.compile(rb"/" + key.encode() + rb"\s+(\d+)\b")
    for key in (
        "Predictor",
        "Columns",
        "Colors",
        "BitsPerComponent",
        "EarlyChange",
    )
}
_PARM_DEFAULTS = {
    "Predictor": 1,
    "Columns": 1,
    "Colors": 1,
    "BitsPerComponent": 8,
    "EarlyChange": 1,
}


def _parms_list(dict_text: bytes, n_filters: int) -> list[dict[str, int]]:
    """Per-filter /DecodeParms (or /DP) dicts aligned with the filter
    chain; missing entries / ``null`` get the spec defaults."""

    def parse(d: bytes | None) -> dict[str, int]:
        out = dict(_PARM_DEFAULTS)
        if d:
            for key, rx in _PARM_INT_RES.items():
                m = rx.search(d)
                if m:
                    out[key] = int(m.group(1))
        return out

    m = _PARMS_RE.search(dict_text)
    if not m:
        return [parse(None)] * n_filters
    val = m.group(1)
    # the non-greedy '<<.*?>>' stops at the FIRST '>>': a parms dict
    # containing a nested dictionary would be silently truncated (keys
    # after the nested dict dropped, defaults substituted). Nested
    # parms dicts are outside the subset — fail loud, never mis-decode.
    if val.startswith(b"<<") and b"<<" in val[2:]:
        raise PdfError("DecodeParms: nested dictionary outside subset")
    if val.startswith(b"["):
        entries = re.findall(rb"<<.*?>>|null", val[1:-1], re.S)
        if any(b"<<" in e[2:] for e in entries if e != b"null"):
            raise PdfError("DecodeParms: nested dictionary outside subset")
        dicts = [None if e == b"null" else e for e in entries]
        dicts += [None] * (n_filters - len(dicts))
        return [parse(d) for d in dicts[:n_filters]]
    return [parse(val if val != b"null" else None)] + [parse(None)] * (
        n_filters - 1
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _row_geometry(parms: dict[str, int]) -> tuple[int, int]:
    colors, bpc = parms["Colors"], parms["BitsPerComponent"]
    rowlen = (parms["Columns"] * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc) // 8)
    if rowlen < 1:
        # /Columns 0 (or /Colors 0) is outside any valid file — the
        # contract is a typed PdfError, never a bare ValueError
        raise PdfError("predictor: zero-width row geometry")
    return rowlen, bpp


def _png_unpredict(data: bytes, parms: dict[str, int]) -> bytes:
    """Reverse PNG row predictors (RFC 2083 §6): each row is a filter
    type byte + predicted bytes; a short final row is accepted (PDF
    content lengths are rarely row-aligned)."""
    rowlen, bpp = _row_geometry(parms)
    out = bytearray()
    # prev starts empty and only ever holds a decoded row: allocation
    # is bounded by the stream itself, so an absurd declared /Columns
    # (a hostile tiny file demanding terabytes) costs nothing — rows
    # are sliced from data, and missing prev bytes read as 0 per spec
    prev = b""
    i = 0
    while i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + len(row)
        if ft > 4:
            raise PdfError(f"PNG predictor: bad filter type {ft}")
        for j in range(len(row)):
            a = row[j - bpp] if j >= bpp else 0
            b = prev[j] if j < len(prev) else 0
            c = prev[j - bpp] if bpp <= j < len(prev) + bpp else 0
            if ft == 1:
                row[j] = (row[j] + a) & 0xFF
            elif ft == 2:
                row[j] = (row[j] + b) & 0xFF
            elif ft == 3:
                row[j] = (row[j] + (a + b) // 2) & 0xFF
            elif ft == 4:
                row[j] = (row[j] + _paeth(a, b, c)) & 0xFF
        out += row
        prev = bytes(row)
    return bytes(out)


def _tiff_unpredict(data: bytes, parms: dict[str, int]) -> bytes:
    """Reverse TIFF predictor 2 (horizontal byte differencing) — only
    the 8-bit-per-component case is in the subset."""
    if parms["BitsPerComponent"] != 8:
        raise PdfError("TIFF predictor: only 8 bits/component supported")
    rowlen, bpp = _row_geometry(parms)
    out = bytearray(data)
    for start in range(0, len(out), rowlen):
        end = min(start + rowlen, len(out))
        for j in range(start + bpp, end):
            out[j] = (out[j] + out[j - bpp]) & 0xFF
    return bytes(out)


def _unpredict(data: bytes, parms: dict[str, int]) -> bytes:
    pred = parms["Predictor"]
    if pred == 1:
        return data
    if pred == 2:
        return _tiff_unpredict(data, parms)
    if 10 <= pred <= 15:
        return _png_unpredict(data, parms)
    raise PdfError(f"unsupported /Predictor {pred}")


def _decode_stream(dict_text: bytes, raw: bytes) -> bytes:
    filters = _filters(dict_text)
    parms = _parms_list(dict_text, len(filters))
    for f, p in zip(filters, parms):
        if f == b"FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise PdfError(f"bad Flate stream: {exc}") from exc
            raw = _unpredict(raw, p)
        elif f == b"LZWDecode":
            raw = _unpredict(_lzw_decode(raw, early=p["EarlyChange"]), p)
        elif p["Predictor"] != 1:
            # the spec attaches predictors to LZW/Flate only
            raise PdfError(f"/Predictor on unsupported filter /{f.decode()}")
        elif f == b"ASCIIHexDecode":
            raw = _ascii_hex_decode(raw)
        elif f == b"ASCII85Decode":
            raw = _ascii85_decode(raw)
        elif f == b"RunLengthDecode":
            raw = _run_length_decode(raw)
        else:
            raise PdfError(f"unsupported stream filter /{f.decode()}")
    return raw


_TYPE_RE = re.compile(rb"/Type\s*/([A-Za-z]+)")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)\b")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)\b")


def _validate_objstm(dict_text: bytes, decoded: bytes) -> None:
    """Structural check of a /Type /ObjStm body: N (num, offset) integer
    pairs in the header, all offsets inside the body region. Content
    streams can never live here (spec), so nothing is extracted — but
    a corrupt object stream is outside the subset and must raise, not
    pass silently."""
    nm = _OBJSTM_N_RE.search(dict_text)
    fm = _OBJSTM_FIRST_RE.search(dict_text)
    if not nm or not fm:
        raise PdfError("object stream missing /N or /First")
    n, first = int(nm.group(1)), int(fm.group(1))
    header = decoded[:first].split()
    if len(header) != 2 * n:
        raise PdfError("object stream header pair count mismatch")
    try:
        nums = [int(x) for x in header]
    except ValueError as exc:
        raise PdfError("non-integer object stream header") from exc
    body_len = len(decoded) - first
    for off in nums[1::2]:
        if off < 0 or off > body_len:
            raise PdfError("object stream offset out of range")


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
        tm = _TYPE_RE.search(dict_text)
        stype = tm.group(1) if tm else b""
        if stype == b"XRef":
            # cross-reference stream (PDF 1.5+): binary table, never
            # content; skipped before decode (its /DecodeParms
            # predictor post-processing is irrelevant to text)
            continue
        sm = _SUBTYPE_RE.search(dict_text)
        if sm and sm.group(1) == b"Image":
            # image XObjects are never text content — skip them, so a
            # digital-text PDF with an embedded /DCTDecode logo keeps
            # its text (review finding: the logo's unsupported-filter
            # raise used to discard the whole document's text)
            continue
        decoded = _decode_stream(dict_text, raw)
        if stype == b"ObjStm":
            # document dictionaries packed in an object stream — the
            # spec forbids nested streams, so no content lives here;
            # validate the N/First header and move on
            _validate_objstm(dict_text, decoded)
            continue
        try:
            content = decoded.decode("latin-1")
        except UnicodeDecodeError as exc:  # pragma: no cover — latin-1 total
            raise PdfError(str(exc)) from exc
        if "BT" not in content:
            continue
        saw_content = True
        _text_from_content(content, lines)
    if not saw_content:
        raise NoTextPdfError("no text content streams found")
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
