"""Split artifact format — the Arrow-native analog of the reference's
self-contained split file (`docs/internals/split-format.md`, tantivy
inverted-index semantics re-expressed columnar):

    {index_dir}/splits/{split_id}/
        postings.parquet    term dictionary + posting lists, sorted by
                            (field, term). Row groups of TERMS_PER_ROW_GROUP
                            rows so a query reads only the row groups that
                            contain its terms (hotcache analog: the small
                            dictionary columns are loaded+cached, the heavy
                            posting columns are fetched per row group).
        fieldnorms.parquet  one row per doc: norm_{field} uint8 columns
                            (1-byte Lucene-quantized doc lengths)
        fastfields.parquet  columnar copies of fast fields (sort/range/agg)
        docstore.parquet    stored fields, row index == local doc id
        footer.json         split-level metadata: num_docs, per-field BM25
                            stats, time range, tags, file sizes

Posting-list encoding per term row:
    doc_ids       binary  int32 little-endian DELTA-encoded doc ids
                          (first absolute), blocks of BLOCK_SIZE docs
    tfs           binary  uint32 term frequencies ('' for record=basic -> tf=1)
    block_last    binary  int32 last doc id of each 128-block (skip data)
    block_max_tf  binary  int32 max tf within each block (block-max metadata
                          for Block-Max-WAND-style pruning)
    positions     binary  int32 token positions, concatenated per posting
    pos_lens      binary  int32 number of positions per posting
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BLOCK_SIZE = 128            # docs per posting block (reference: 128-doc blocks)
TERMS_PER_ROW_GROUP = 2048  # dictionary rows per parquet row group
# positions live in their own file with SMALL row groups: a phrase query
# touching 2 terms decompresses ~256 terms' positions, not 2048 terms'
POS_TERMS_PER_ROW_GROUP = 256

POSTINGS_FILE = "postings.parquet"
POSITIONS_FILE = "positions.parquet"
FIELDNORMS_FILE = "fieldnorms.parquet"
FASTFIELDS_FILE = "fastfields.parquet"
DOCSTORE_FILE = "docstore.parquet"
def _open_parquet(path: str) -> "pq.ParquetFile":
    """ParquetFile over a local path (fast path) or an object-store URI
    (range reads through pyarrow.fs — only the requested row groups /
    column chunks leave storage)."""
    from quickwit_ray import storage

    if storage.is_object_uri(path):
        return pq.ParquetFile(storage.open_input(path))
    return pq.ParquetFile(path)


def _read_parquet(path: str, **kw) -> pa.Table:
    from quickwit_ray import storage

    if storage.is_object_uri(path):
        loc, fs = storage.parquet_location(path)
        return pq.read_table(loc, filesystem=fs, **kw)
    return pq.read_table(path, **kw)


def _artifact_exists(path: str) -> bool:
    from quickwit_ray import storage

    return storage.exists(path)


FOOTER_FILE = "footer.json"
# impact-ordered hot-term cache (the reference hotcache analog,
# quickwit-directories/src/hot_directory.rs): per heavy term, the full
# block metadata + the top-impact blocks pre-decoded, in 1-row parquet
# row groups — a cold top-k needs ONE small read instead of
# decompressing a 2048-term posting column chunk
HOTCACHE_FILE = "hotcache.parquet"
# terms below this df (128 blocks) read cheap enough anyway; the
# threshold also bounds the BUILD cost — each cached term costs one
# posting-row-group decompress at packaging time, so sweeping in
# mid-weight terms makes every merge re-read most of the file
HOT_DF_THRESHOLD = 16384
HOT_EMBED_BLOCKS = 32       # top-impact blocks embedded (~4096 docs)
MAX_HOT_TERMS = 256         # per split, heaviest df first


def delta_encode(doc_ids: np.ndarray) -> bytes:
    d = np.asarray(doc_ids, np.int32)
    out = np.empty_like(d)
    if len(d):
        out[0] = d[0]
        np.subtract(d[1:], d[:-1], out=out[1:])
    return out.tobytes()


def delta_decode(buf: bytes) -> np.ndarray:
    d = np.frombuffer(buf, np.int32).copy()
    np.cumsum(d, out=d)
    return d


def block_meta(doc_ids: np.ndarray, tfs: Optional[np.ndarray],
               norms: Optional[np.ndarray] = None
               ) -> tuple[bytes, bytes, bytes, bytes]:
    """(block_last, block_max_tf, block_lens, block_min_norm) for one
    posting list; blocks of BLOCK_SIZE docs (merged splits may carry
    shorter blocks — the explicit lens column makes block byte-ranges
    recoverable there). ``norms`` is the per-POSTING fieldnorm-id array
    (uint8, parallel to doc_ids); the per-block MIN norm id (= shortest
    doc, fieldnorm table is monotone) yields a per-block SCORE upper
    bound at query time that still prunes when tf is flat — the tantivy
    BlockWAND (fieldnorm, tf) pair analog. b'' when norms is None."""
    n = len(doc_ids)
    if n == 0:
        return b"", b"", b"", b""
    if n <= BLOCK_SIZE:  # fast path: the overwhelmingly common single block
        last = np.asarray([doc_ids[-1]], np.int32)
        mx = np.asarray([tfs.max() if tfs is not None and len(tfs) else 1], np.int32)
        mn = (np.asarray([norms.min()], np.uint8).tobytes()
              if norms is not None and len(norms) else b"")
        return last.tobytes(), mx.tobytes(), np.asarray([n], np.int32).tobytes(), mn
    starts = np.arange(0, n, BLOCK_SIZE)
    ends = np.minimum(starts + BLOCK_SIZE, n)
    block_last = np.asarray(doc_ids, np.int32)[ends - 1]
    lens = (ends - starts).astype(np.int32)
    if tfs is None or len(tfs) == 0:
        block_max = np.ones(len(starts), np.int32)
    else:
        block_max = np.maximum.reduceat(np.asarray(tfs, np.int64), starts).astype(np.int32)
    bmin = (np.minimum.reduceat(np.asarray(norms, np.uint8), starts).tobytes()
            if norms is not None and len(norms) else b"")
    return block_last.tobytes(), block_max.tobytes(), lens.tobytes(), bmin


POSTINGS_SCHEMA = pa.schema([
    ("field", pa.string()),
    ("term", pa.string()),
    ("df", pa.int32()),
    ("max_tf", pa.int32()),
    ("doc_ids", pa.binary()),
    ("tfs", pa.binary()),
    ("block_last", pa.binary()),
    ("block_max_tf", pa.binary()),
    ("block_lens", pa.binary()),
    ("block_min_norm", pa.binary()),
])

POSITIONS_SCHEMA = pa.schema([
    ("positions", pa.binary()),
    ("pos_lens", pa.binary()),
])

# columns that constitute the (small, cacheable) term dictionary
DICT_COLUMNS = ["field", "term", "df", "max_tf"]


DOCSTORE_RG_MAX_ROWS = 8192
DOCSTORE_RG_TARGET_BYTES = 4 << 20  # raw bytes per doc-store row group


def docstore_row_group_size(tbl: pa.Table) -> int:
    """Doc-store row groups sized by BYTES, not rows (the tantivy
    doc-store analog: point fetches decompress ONE block, so the block
    must be small). Fat rows — webtext bodies, multi-KB payloads — get
    small groups (~4MB raw each); log-sized rows keep the 8192-row cap
    so parquet metadata stays light at 10M-doc splits."""
    if tbl.num_rows == 0:
        return DOCSTORE_RG_MAX_ROWS
    avg = max(tbl.nbytes / tbl.num_rows, 1.0)
    return max(64, min(DOCSTORE_RG_MAX_ROWS,
                       int(DOCSTORE_RG_TARGET_BYTES / avg)))


# ---------------------------------------------------------------------------
# framed blob store for fat stored columns (the tantivy doc-store analog:
# `store/writer.rs` writes ~16KB compressed blocks + a skip index, so a
# point fetch decompresses ONE small block). Parquet row groups cannot go
# that small without exploding file metadata, so fat columns (webtext
# bodies, html payloads) move out of docstore.parquet into a flat file of
# zstd frames with a trailer index: frame payload = u32 byte-lens per row
# (0xFFFFFFFF = null) + concatenated row bytes.
# ---------------------------------------------------------------------------

DOCBLOB_FRAME_RAW_TARGET = 64 << 10   # raw bytes per frame
DOCBLOB_COL_THRESHOLD = 256           # avg raw bytes/row to blob a column
DOCBLOB_NULL = 0xFFFFFFFF
_DOCBLOB_MAGIC = b"QWRBLOB1"
# v2 trailer adds an explicit per-frame row-count array after rawlens, so
# frames need not sit on a uniform row grid — the merge consolidation path
# byte-copies frames from sources whose grids don't align (and whose tail
# frames are short). Writers keep emitting v1 (their grids ARE uniform);
# readers accept both.
_DOCBLOB_MAGIC2 = b"QWRBLOB2"


def _blob_eligible(typ: pa.DataType) -> bool:
    return (pa.types.is_string(typ) or pa.types.is_large_string(typ)
            or pa.types.is_binary(typ) or pa.types.is_large_binary(typ))


class BlobColumnWriter:
    """Streaming framed writer for ONE fat stored column."""

    def __init__(self, path: str, rows_per_frame: int, value_type: str):
        self.path = path
        self.rows_per_frame = int(rows_per_frame)
        self.value_type = value_type  # "string" | "binary"
        self._f = open(path, "wb")
        self._codec = pa.Codec("zstd", 1)
        self._pend: list[pa.Array] = []
        self._pend_rows = 0
        self._offs = [0]
        self._rawlens: list[int] = []
        self.num_rows = 0

    def add(self, col) -> None:
        # frames are emitted as SLICES of the incoming chunks (never a
        # whole-batch concat), so arbitrarily large inputs — multi-GB
        # large_binary chunks included — stay within per-frame memory;
        # only the <rows_per_frame carry between chunks is ever
        # concatenated (both sides tiny)
        R = self.rows_per_frame
        for ch in (col.chunks if isinstance(col, pa.ChunkedArray)
                   else [col]):
            self.num_rows += len(ch)
            if self._pend_rows:
                take = min(R - self._pend_rows, len(ch))
                self._pend.append(ch.slice(0, take))
                self._pend_rows += take
                ch = ch.slice(take)
                if self._pend_rows == R:
                    self._emit(pa.concat_arrays(
                        [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                         else a for a in self._pend]))
                    self._pend, self._pend_rows = [], 0
            full = (len(ch) // R) * R
            for s in range(0, full, R):
                self._emit(ch.slice(s, R))
            rest = ch.slice(full)
            if len(rest):
                self._pend.append(rest)
                self._pend_rows += len(rest)

    def _emit(self, fr: pa.Array) -> None:
        # vectorized payload build: offsets-buffer slicing; handles both
        # 32-bit (string/binary) and 64-bit (large_*) offset widths
        # without casting (a cast would UTF-8-validate binary payloads
        # and overflow on >2GB chunks)
        t = fr.type
        if not _blob_eligible(t):
            fr = fr.cast(pa.string())
            t = fr.type
        wide = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
        bufs = fr.buffers()
        if bufs[1] is None:  # all-null array (e.g. pa.nulls): no offsets
            off = np.zeros(len(fr) + 1, np.int64)
        elif wide:
            off = np.frombuffer(bufs[1], np.int64, count=len(fr) + 1,
                                offset=fr.offset * 8)
        else:
            off = np.frombuffer(bufs[1], np.int32, count=len(fr) + 1,
                                offset=fr.offset * 4).astype(np.int64)
        data_full = (np.frombuffer(bufs[2], np.uint8)
                     if bufs[2] is not None else np.empty(0, np.uint8))
        rowlens = np.diff(off)
        valid = np.asarray(fr.is_valid())
        if valid.all() or not rowlens[~valid].any():
            # fast path: null slots occupy no extent -> payload is the
            # contiguous value range
            data = data_full[off[0]:off[-1]]
        else:
            # null slots with NONZERO extents (pc.if_else/coalesce keep
            # the underlying bytes): gather only the valid extents, or
            # every row after the null would misalign against the
            # sentinel length the reader decodes as 0
            eff = np.where(valid, rowlens, 0).astype(np.int64)
            total = int(eff.sum())
            seg_off = np.concatenate([[0], np.cumsum(eff)[:-1]])
            big_idx = np.repeat(off[:-1] - seg_off, eff) \
                + np.arange(total)
            data = data_full[big_idx]
        lens = rowlens.astype(np.uint32)
        lens[~valid] = DOCBLOB_NULL  # nulls contribute 0 payload bytes
        payload = lens.tobytes() + data.tobytes()
        fz = self._codec.compress(payload, asbytes=True)
        self._f.write(fz)
        self._offs.append(self._offs[-1] + len(fz))
        self._rawlens.append(len(payload))

    def close(self) -> None:
        if self._pend_rows:
            self._emit(pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in self._pend]))
            self._pend, self._pend_rows = [], 0
        idx_off = self._offs[-1]
        self._f.write(np.asarray(self._offs, np.int64).tobytes())
        self._f.write(np.asarray(self._rawlens, np.int64).tobytes())
        self._f.write(np.asarray([self.rows_per_frame, len(self._rawlens),
                                  self.num_rows, idx_off],
                                 np.int64).tobytes())
        self._f.write(_DOCBLOB_MAGIC)
        self._f.close()


class BlobColumnReader:
    """Point + scan reads over one blob column file."""

    def __init__(self, path: str, value_type: str = "string"):
        from quickwit_ray import storage

        self.path = path
        self.value_type = value_type
        self._codec = pa.Codec("zstd", 1)
        self._f = (storage.open_input(path)
                   if storage.is_object_uri(path) else open(path, "rb"))
        self._f.seek(-40, 2)  # 4 x i64 + magic
        tr = self._f.read(40)
        magic = tr[-8:]
        if magic not in (_DOCBLOB_MAGIC, _DOCBLOB_MAGIC2):
            raise ValueError(f"not a blob column file: {path}")
        (self.rows_per_frame, self.nframes, self.num_rows,
         idx_off) = (int(x) for x in np.frombuffer(tr[:32], np.int64))
        self._f.seek(idx_off)
        n = self.nframes
        if magic == _DOCBLOB_MAGIC:
            raw = self._f.read((n + 1) * 8 + n * 8)
            self.offs = np.frombuffer(raw[:(n + 1) * 8], np.int64)
            self.rawlens = np.frombuffer(raw[(n + 1) * 8:], np.int64)
            # uniform grid: full frames + short tail
            self.frame_rows = np.full(n, self.rows_per_frame, np.int64)
            if n:
                self.frame_rows[-1] = (self.num_rows
                                       - (n - 1) * self.rows_per_frame)
        else:
            raw = self._f.read((n + 1) * 8 + 2 * n * 8)
            self.offs = np.frombuffer(raw[:(n + 1) * 8], np.int64)
            self.rawlens = np.frombuffer(
                raw[(n + 1) * 8:(2 * n + 1) * 8], np.int64)
            self.frame_rows = np.frombuffer(
                raw[(2 * n + 1) * 8:], np.int64)
        # frame fi covers rows [row_starts[fi], row_starts[fi+1])
        self.row_starts = np.concatenate(
            [[0], np.cumsum(self.frame_rows)]).astype(np.int64)
        self.bytes_read = 0

    def _frame(self, fi: int) -> tuple[np.ndarray, bytes, np.ndarray]:
        """(lens u32 with null sentinel, data bytes, byte starts)."""
        self._f.seek(int(self.offs[fi]))
        buf = self._f.read(int(self.offs[fi + 1] - self.offs[fi]))
        payload = self._codec.decompress(buf, int(self.rawlens[fi]),
                                         asbytes=True)
        self.bytes_read += int(self.rawlens[fi])
        nrows = int(self.frame_rows[fi])
        lens = np.frombuffer(payload, np.uint32, count=nrows)
        eff = np.where(lens == DOCBLOB_NULL, 0, lens).astype(np.int64)
        starts = 4 * nrows + np.concatenate([[0], np.cumsum(eff)])
        return lens, payload, starts

    def _frame_array(self, fi: int) -> pa.Array:
        """One frame -> pa.binary() array, zero-copy from the payload."""
        lens, payload, starts = self._frame(fi)
        nrows = len(lens)
        valid = lens != DOCBLOB_NULL
        off32 = (starts - starts[0]).astype(np.int32)
        data = np.frombuffer(payload, np.uint8)[starts[0]:starts[-1]]
        vbuf = None
        nulls = int((~valid).sum())
        if nulls:
            vbuf = pa.py_buffer(np.packbits(valid, bitorder="little"))
        return pa.Array.from_buffers(
            pa.binary(), nrows,
            [vbuf, pa.py_buffer(off32), pa.py_buffer(data)],
            null_count=nulls)

    def take(self, rows: np.ndarray) -> pa.Array:
        """Rows (local ordinals) -> pa array in request order."""
        rows = np.asarray(rows, np.int64)
        vals: dict[int, Optional[bytes]] = {}
        frame_of = np.searchsorted(self.row_starts, rows, side="right") - 1
        for fi in np.unique(frame_of):
            lens, payload, starts = self._frame(int(fi))
            base = int(self.row_starts[fi])
            for r in rows[(rows >= base)
                          & (rows < self.row_starts[fi + 1])]:
                li = int(r - base)
                vals[int(r)] = (None if lens[li] == DOCBLOB_NULL else
                                payload[starts[li]:starts[li + 1]])
        out = [vals[int(r)] for r in rows]
        arr = pa.array(out, pa.binary())
        return arr.cast(pa.string()) if self.value_type == "string" else arr

    def scan(self) -> pa.Array:
        """Full sequential read -> one pa array (merge rewrites, deletes).
        Rows stay zero-copy views of the frame payloads — a 10M-doc scan
        never materializes per-row Python bytes."""
        chunks = [self._frame_array(fi) for fi in range(self.nframes)]
        arr = (pa.concat_arrays(chunks) if chunks
               else pa.array([], pa.binary()))
        return arr.cast(pa.string()) if self.value_type == "string" else arr


def blob_rows_per_frame(avg_row_bytes: float) -> int:
    return max(8, min(1024, int(DOCBLOB_FRAME_RAW_TARGET
                                / max(avg_row_bytes, 1.0))))


def split_blob_columns(tbl: pa.Table) -> list[str]:
    """Stored columns that should live in the blob store: eligible type
    and fat rows on average."""
    if tbl.num_rows == 0:
        return []
    out = []
    for name in tbl.column_names:
        col = tbl[name]
        if _blob_eligible(col.type) \
                and col.nbytes / tbl.num_rows >= DOCBLOB_COL_THRESHOLD:
            out.append(name)
    return out


def resolve_docstore_units(split_dir: str, footer: dict,
                           num_docs: int) -> list[dict]:
    """The ONE place the footer's doc-store layout resolves to units
    (absolute paths): used by SplitReader.docstore_units and the merge
    stacking/rewrite paths — keep them in lockstep."""

    def _abs(specs):
        return [dict(b, file=os.path.join(split_dir, b["file"]))
                for b in (specs or ())]

    segs = footer.get("docstore_segments")
    if segs:
        return [{
            "parquet": (os.path.join(split_dir, s["file"])
                        if s.get("file") else None),
            "num_docs": int(s["num_docs"]),
            "blobs": _abs(s.get("blobs")),
        } for s in segs]
    p = os.path.join(split_dir, DOCSTORE_FILE)
    blobs = _abs(footer.get("docstore_blobs"))
    if not _artifact_exists(p) and not blobs:
        return []
    return [{"parquet": p if _artifact_exists(p) else None,
             "num_docs": num_docs, "blobs": blobs}]


def write_docstore(dir_: str, tbl: pa.Table) -> list[dict]:
    """One-shot doc-store write (merge consolidation / rewrites): fat
    columns to framed blob files, the rest to docstore.parquet with
    byte-sized row groups. Returns footer ``docstore_blobs`` specs."""
    blob_cols = split_blob_columns(tbl)
    specs = []
    for i, name in enumerate(blob_cols):
        fn = f"docblobs-{i:02d}.bin"
        vt = ("string" if pa.types.is_string(tbl[name].type)
              or pa.types.is_large_string(tbl[name].type) else "binary")
        w = BlobColumnWriter(
            os.path.join(dir_, fn),
            blob_rows_per_frame(tbl[name].nbytes / tbl.num_rows), vt)
        w.add(tbl[name])
        w.close()
        specs.append({"column": name, "file": fn, "type": vt,
                      "rows_per_frame": w.rows_per_frame,
                      "num_rows": w.num_rows})
    rest = tbl.drop_columns(blob_cols)
    if rest.num_columns:
        pq.write_table(rest, os.path.join(dir_, DOCSTORE_FILE),
                       compression="zstd", compression_level=1,
                       row_group_size=docstore_row_group_size(rest))
    return specs


def concat_blob_files(sources: list[tuple[Optional[str], int]],
                      out_path: str) -> int:
    """Consolidate blob column files WITHOUT re-encoding: byte-copy every
    source's zstd frames and write one QWRBLOB2 trailer whose per-frame
    row counts are the concatenation of the sources' grids (tails stay
    short mid-file — v2 readers address by the explicit grid). A ``None``
    source contributes ``num_rows`` synthetic all-null rows (placeholder
    for a merged-in split that had no stored value), encoded as tiny
    sentinel-only frames. Returns total rows. Raises ValueError when a
    real source's row count disagrees with the expected count (caller
    falls back to the re-encoding rewrite)."""
    codec = pa.Codec("zstd", 1)
    offs: list[int] = [0]
    rawlens: list[int] = []
    frows: list[int] = []
    total = 0
    with open(out_path, "wb") as out:
        for path, nrows in sources:
            nrows = int(nrows)
            if path is None:
                total += nrows
                step = 1 << 16
                for s in range(0, nrows, step):
                    n = min(step, nrows - s)
                    payload = np.full(n, DOCBLOB_NULL, np.uint32).tobytes()
                    fz = codec.compress(payload, asbytes=True)
                    out.write(fz)
                    offs.append(offs[-1] + len(fz))
                    rawlens.append(len(payload))
                    frows.append(n)
                continue
            src = BlobColumnReader(path)
            try:
                if src.num_rows != nrows:
                    raise ValueError(
                        f"blob file {path} has {src.num_rows} rows, "
                        f"unit expects {nrows}")
                base = offs[-1]
                src._f.seek(0)
                left = int(src.offs[-1])  # frames region = [0, idx_off)
                while left:
                    chunk = src._f.read(min(left, 4 << 20))
                    if not chunk:
                        raise ValueError(f"truncated blob file: {path}")
                    out.write(chunk)
                    left -= len(chunk)
                offs.extend(int(o) + base for o in src.offs[1:])
                rawlens.extend(int(x) for x in src.rawlens)
                frows.extend(int(x) for x in src.frame_rows)
                total += src.num_rows
            finally:
                src._f.close()
        idx_off = offs[-1]
        out.write(np.asarray(offs, np.int64).tobytes())
        out.write(np.asarray(rawlens, np.int64).tobytes())
        out.write(np.asarray(frows, np.int64).tobytes())
        out.write(np.asarray([0, len(frows), total, idx_off],
                             np.int64).tobytes())
        out.write(_DOCBLOB_MAGIC2)
    return total


def _as_column(v):
    """Column values for pa.table: plain python lists pass through; lists
    of pa.Array chunks (the writer's zero-copy flush) become one
    ChunkedArray."""
    if isinstance(v, list) and v and isinstance(v[0], pa.Array):
        return pa.chunked_array(v)
    return v


def _binary_nonempty(col) -> bool:
    if col is None:
        return False
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        import pyarrow.compute as pc

        return bool(pc.sum(pc.binary_length(col)).as_py() or 0)
    return any(len(b) for b in col)


def write_postings_file(path: str, rows: dict[str, list]) -> None:
    """Write the postings file and (when any positional data exists) the
    row-aligned positions sidecar file next to it. Column values may be
    python lists of bytes/str/int or lists of pa.Array chunks."""
    table = pa.table({k: _as_column(rows[k]) for k in POSTINGS_SCHEMA.names},
                     schema=POSTINGS_SCHEMA)
    pq.write_table(table, path, row_group_size=TERMS_PER_ROW_GROUP,
                   compression="zstd", compression_level=1)
    pos = _as_column(rows.get("positions"))
    if _binary_nonempty(pos):
        ptable = pa.table({"positions": pos,
                           "pos_lens": _as_column(rows["pos_lens"])},
                          schema=POSITIONS_SCHEMA)
        pq.write_table(ptable,
                       os.path.join(os.path.dirname(path), POSITIONS_FILE),
                       row_group_size=POS_TERMS_PER_ROW_GROUP,
                       compression="zstd", compression_level=1)


class ExactRowGroupWriter:
    """Buffers appended tables and writes parquet row groups of EXACTLY
    ``rows_per_group`` rows (the readers address dictionary rows by
    row // rows_per_group), flushing as soon as a full group is buffered."""

    def __init__(self, path: str, schema: pa.Schema, rows_per_group: int):
        self.path = path
        self.schema = schema
        self.rows_per_group = rows_per_group
        self._writer: Optional[pq.ParquetWriter] = None
        self._parts: list[pa.Table] = []
        self._buffered = 0
        self.total_rows = 0

    def _ensure_writer(self) -> None:
        if self._writer is None:
            self._writer = pq.ParquetWriter(self.path, self.schema,
                                            compression="zstd",
                                            compression_level=1)

    # one write_table call per row group is ~4 ms of fixed overhead; a
    # merge emits thousands of groups. Buffer up to GROUPS_PER_WRITE full
    # groups (or MAX_BUFFER_BYTES for fat binary rows) and let ONE
    # write_table call slice them into exact groups itself.
    GROUPS_PER_WRITE = 32
    MAX_BUFFER_BYTES = 96 << 20

    def write(self, tbl: pa.Table) -> None:
        if tbl.num_rows == 0:
            return
        part = tbl.select(self.schema.names).cast(self.schema)
        self._parts.append(part)
        self._buffered += tbl.num_rows
        self._buffered_bytes = getattr(self, "_buffered_bytes", 0) + part.nbytes
        self.total_rows += tbl.num_rows
        if (self._buffered >= self.rows_per_group * self.GROUPS_PER_WRITE
                or (self._buffered_bytes >= self.MAX_BUFFER_BYTES
                    and self._buffered >= self.rows_per_group)):
            big = pa.concat_tables(self._parts)
            nfull = (big.num_rows // self.rows_per_group) * self.rows_per_group
            head = big.slice(0, nfull)
            rest = big.slice(nfull)
            self._ensure_writer()
            self._writer.write_table(head, row_group_size=self.rows_per_group)
            self._parts = [rest] if rest.num_rows else []
            self._buffered = rest.num_rows
            self._buffered_bytes = rest.nbytes if rest.num_rows else 0

    def close(self) -> None:
        if self._buffered:
            big = pa.concat_tables(self._parts)
            self._ensure_writer()
            self._writer.write_table(big, row_group_size=self.rows_per_group)
            self._parts, self._buffered = [], 0
            self._buffered_bytes = 0
        if self._writer is not None:
            self._writer.close()



def decode_posting_blocks(deltas: np.ndarray, tfs_all: np.ndarray,
                          lens: np.ndarray, block_last: np.ndarray,
                          sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Segmented vectorized decode of an arbitrary posting-block subset
    -> (absolute doc ids, tfs). Mirrors the scorer's decode_blocks
    (split_search.term_topk_blockmax) for write-time use."""
    sel = np.sort(np.asarray(sel, np.int64))
    lens = np.asarray(lens, np.int64)
    bl = np.asarray(block_last, np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    ls = lens[sel]
    ss = starts[sel]
    total = int(ls.sum())
    seg_off = np.concatenate([[0], np.cumsum(ls)[:-1]])
    big_idx = np.repeat(ss - seg_off, ls) + np.arange(total)
    d = deltas[big_idx].astype(np.int64)
    cs = np.cumsum(d)
    seg_base = cs[seg_off] - d[seg_off]
    abs_prev = np.where(sel > 0, bl[sel - 1], 0)
    docs = cs - np.repeat(seg_base, ls) + np.repeat(abs_prev, ls)
    tfs = (np.ones(total, np.int64) if len(tfs_all) == 0
           else tfs_all[big_idx].astype(np.int64))
    return docs, tfs


def block_score_bounds(block_max_tf: np.ndarray, block_min_norm: np.ndarray,
                       nblocks: int, df: float, num_docs: float,
                       avgdl: float, flat: bool) -> np.ndarray:
    """Per-block BM25 score upper bounds (the tantivy BlockWAND pair
    bound: score(max_tf, shortest doc in block) >= any doc's score in the
    block). Shared by the scorer's block pruning and the hotcache
    builder's impact ordering."""
    from quickwit_ray.functions.bm25 import B, K1, id_to_fieldnorm
    from quickwit_ray.functions.bm25 import idf as idf_fn

    bmax = (np.ones(nblocks) if flat
            else np.asarray(block_max_tf, np.float64))
    w = float(idf_fn(float(df), float(num_docs))) * (1.0 + K1)
    if len(block_min_norm) == nblocks and nblocks > 0:
        dl_min = id_to_fieldnorm(np.asarray(block_min_norm, np.uint8)
                                 ).astype(np.float64)
        cache = K1 * (1.0 - B + B * dl_min / max(avgdl, 1e-9))
    else:
        cache = K1 * (1.0 - B)  # legacy: dl -> 0 bound
    return w * bmax / (bmax + cache) * (1.0 + 1e-6)


def build_hotcache(split_dir: str, field_stats: dict) -> int:
    """Write the impact-ordered hot-term cache for a finished split.

    For each heavy term (df >= HOT_DF_THRESHOLD, heaviest MAX_HOT_TERMS):
    full block metadata + the HOT_EMBED_BLOCKS highest-upper-bound blocks
    pre-decoded to absolute doc ids, one parquet row group per term. The
    scorer seeds its threshold from the embedded blocks and — when every
    other block's bound falls below it — answers the top-k without ever
    touching the 2048-term posting row group. Readers treat the file as
    optional (legacy splits fall back to the full read). Returns the
    number of cached terms."""
    path = os.path.join(split_dir, POSTINGS_FILE)
    pf = pq.ParquetFile(path)
    names = pf.schema_arrow.names
    if "block_lens" not in names:
        return 0  # legacy layout: no per-block lengths, nothing to seed
    dict_tbl = pf.read(columns=["field", "df"])
    df_all = np.asarray(dict_tbl["df"], np.int64)
    cand = np.nonzero(df_all >= max(HOT_DF_THRESHOLD,
                                    (HOT_EMBED_BLOCKS + 1) * BLOCK_SIZE))[0]
    if len(cand) == 0:
        return 0
    if len(cand) > MAX_HOT_TERMS:
        cand = cand[np.argsort(-df_all[cand], kind="stable")[:MAX_HOT_TERMS]]
        cand.sort()
    fields = np.asarray(dict_tbl["field"])
    cols = ["doc_ids", "tfs", "block_last", "block_max_tf", "block_lens"]
    has_min_norm = "block_min_norm" in names
    if has_min_norm:
        cols.append("block_min_norm")
    rows_out: list[dict] = []
    for rg in sorted({int(r) // TERMS_PER_ROW_GROUP for r in cand}):
        tbl = pf.read_row_group(rg, columns=cols)
        for r in (int(c) for c in cand
                  if c // TERMS_PER_ROW_GROUP == rg):
            i = r - rg * TERMS_PER_ROW_GROUP
            deltas = np.frombuffer(tbl["doc_ids"][i].as_py() or b"", np.int32)
            tfs_all = np.frombuffer(tbl["tfs"][i].as_py() or b"", np.uint32)
            bl = np.frombuffer(tbl["block_last"][i].as_py() or b"", np.int32)
            bmaxtf = np.frombuffer(tbl["block_max_tf"][i].as_py() or b"",
                                   np.int32)
            lens = np.frombuffer(tbl["block_lens"][i].as_py() or b"",
                                 np.int32).astype(np.int64)
            bmin = (np.frombuffer(tbl["block_min_norm"][i].as_py() or b"",
                                  np.uint8) if has_min_norm
                    else np.empty(0, np.uint8))
            if len(lens) <= HOT_EMBED_BLOCKS or lens.sum() != df_all[r]:
                continue
            st = field_stats.get(str(fields[r]), {})
            flat = len(tfs_all) == 0
            ub = block_score_bounds(
                bmaxtf, bmin, len(lens), float(df_all[r]),
                float(st.get("num_docs", 0) or 1),
                float(st.get("avgdl", 1.0) or 1.0), flat)
            sel = np.sort(np.argsort(-ub, kind="stable")
                          [:HOT_EMBED_BLOCKS]).astype(np.int32)
            docs, tfs = decode_posting_blocks(deltas, tfs_all, lens, bl, sel)
            rows_out.append({
                "row": r, "df": int(df_all[r]),
                "block_last": bl.tobytes(),
                "block_max_tf": bmaxtf.tobytes(),
                "block_lens": lens.astype(np.int32).tobytes(),
                "block_min_norm": bmin.tobytes(),
                "sel": sel.tobytes(),
                "docs": docs.astype(np.int32).tobytes(),
                "tfs": tfs.astype(np.uint32).tobytes(),
                "has_tfs": not flat,
            })
    if not rows_out:
        return 0
    t = pa.table({k: [r[k] for r in rows_out] for k in rows_out[0]})
    pq.write_table(t, os.path.join(split_dir, HOTCACHE_FILE),
                   row_group_size=1, compression="zstd")
    return len(rows_out)


def write_footer(split_dir: str, footer: dict) -> None:
    n_hot = 0
    # a split with fewer docs than the df threshold cannot hold a hot
    # term — skip even the dict read (keeps small-split build free)
    if not os.environ.get("QW_RAY_DISABLE_HOTCACHE") \
            and int(footer.get("num_docs", 0)) >= max(
                HOT_DF_THRESHOLD, (HOT_EMBED_BLOCKS + 1) * BLOCK_SIZE):
        try:
            n_hot = build_hotcache(split_dir,
                                   footer.get("field_stats") or {})
        except Exception:  # noqa: BLE001 — a pure optimization
            n_hot = 0
    if n_hot:
        footer = dict(footer, hotcache_terms=n_hot)
    files = {}
    import glob as _glob

    seg_files = sorted(os.path.basename(p)
                       for pat in ("docstore-seg-*.parquet",
                                   "docblobs-*.bin")
                       for p in _glob.glob(os.path.join(split_dir, pat)))
    for fn in (POSTINGS_FILE, POSITIONS_FILE, FIELDNORMS_FILE, FASTFIELDS_FILE,
               DOCSTORE_FILE, HOTCACHE_FILE, *seg_files):
        p = os.path.join(split_dir, fn)
        if os.path.exists(p):
            files[fn] = os.path.getsize(p)
    footer = dict(footer, files=files, format_version=1)
    with open(os.path.join(split_dir, FOOTER_FILE), "w") as f:
        json.dump(footer, f, separators=(",", ":"))


class SplitReader:
    """Open one split for search. The term dictionary (4 small columns) is
    loaded once and kept; heavy posting columns are read per row group on
    demand — the analog of the reference's hotcache + warmup byte-range
    reads (`quickwit-search/src/leaf.rs:207-409`)."""

    def __init__(self, split_dir: str):
        self.split_dir = split_dir
        # cumulative decompressed bytes materialized by this reader —
        # drives the search-admission byte budget (search/permits.py)
        self.bytes_read: int = 0
        # bytes currently RETAINED by this reader's internal caches
        # (dict columns, row groups, raw/decoded postings, fieldnorms,
        # fastfields) — drives the byte-bound reader LRU (the reference's
        # 1 GB fast-field / 500 MB footer cache budgets,
        # node_config/mod.rs:261-266)
        self.retained_bytes: int = 0
        from quickwit_ray import storage

        self.footer = json.loads(
            storage.read_bytes(os.path.join(split_dir, FOOTER_FILE)))
        self.num_docs: int = self.footer["num_docs"]
        self.field_stats: dict = self.footer.get("field_stats", {})
        self._pf = _open_parquet(os.path.join(split_dir, POSTINGS_FILE))
        # LAZY term dictionary (the FST-block analog): the numeric df /
        # max_tf columns load eagerly (scorers index them by global row),
        # but the field/term STRING columns — the bulk of the dictionary
        # at web scale — load per 2048-term row group on demand; lookups
        # binary-search across row groups probing only first keys. A cold
        # top-k touches O(log #rowgroups) dictionary row groups instead
        # of the whole string dictionary.
        dict_tbl = self._pf.read(columns=["df", "max_tf"])
        self.bytes_read += dict_tbl.nbytes
        self.retained_bytes += dict_tbl.nbytes
        self.df = np.asarray(dict_tbl["df"], np.int64)
        self.max_tf = np.asarray(dict_tbl["max_tf"], np.int64)
        md = self._pf.metadata
        counts = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        self._dict_rg_starts = np.concatenate(
            [[0], np.cumsum(counts)]).astype(np.int64)
        self._num_terms = int(self._dict_rg_starts[-1])
        self._dict_segs: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._dict_first_keys: dict[int, tuple[str, str]] = {}
        self._field_bounds_cache: dict[str, tuple[int, int]] = {}
        # hybrid eager/lazy: a SMALL string dictionary (compressed
        # field+term columns under 4 MB) loads whole at open — one cheap
        # read beats per-query probe decompression; web-scale splits
        # (100+ MB dictionaries) stay lazy
        string_bytes = 0
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                if c.path_in_schema in ("field", "term"):
                    string_bytes += c.total_compressed_size
        self._dict_eager: Optional[tuple[pa.Array, pa.Array]] = None
        if 0 < string_bytes < (4 << 20):
            tbl = self._pf.read(columns=["field", "term"])
            self.bytes_read += tbl.nbytes
            self.retained_bytes += tbl.nbytes
            # keep the Arrow columns; the numpy object-array conversion
            # (the expensive part of open — ~35 ms on a 300k-term dict)
            # is deferred per row group to _dict_seg, so a query that
            # probes 3 dictionary row groups converts only those
            f_col = tbl["field"].combine_chunks()
            t_col = tbl["term"].combine_chunks()
            self._dict_eager = (f_col, t_col)
            for rg in range(len(counts)):
                s = int(self._dict_rg_starts[rg])
                if s < int(self._dict_rg_starts[rg + 1]):
                    self._dict_first_keys[rg] = (str(f_col[s]), str(t_col[s]))
        self._fieldnorms: Optional[pa.Table] = None
        self._fastfields: Optional[pa.Table] = None
        self._postings_cache: dict[int, dict] = {}
        self._rg_cache: dict = {}
        from collections import OrderedDict as _OD

        self._raw_cache: "_OD[int, dict]" = _OD()
        self._pos_pf: Optional[pq.ParquetFile] = None
        self._legacy_positions = "positions" in self._pf.schema_arrow.names
        # hotcache (impact-ordered hot-term sidecar): row -> row-group
        # index, resolved lazily; None = not probed yet, {} = absent
        self._hot_index: Optional[dict[int, int]] = None
        self._hot_pf: Optional[pq.ParquetFile] = None
        self._hot_cache: dict[int, dict] = {}
        import threading

        self._docstore_lock = threading.Lock()

    # -- term dictionary (lazy per-row-group segments) -----------------------

    def _dict_seg(self, rg: int) -> tuple[np.ndarray, np.ndarray]:
        seg = self._dict_segs.get(rg)
        if seg is None:
            s = int(self._dict_rg_starts[rg])
            e = int(self._dict_rg_starts[rg + 1])
            if self._dict_eager is not None:
                f_col, t_col = self._dict_eager
                seg = (np.asarray(f_col.slice(s, e - s)),
                       np.asarray(t_col.slice(s, e - s)))
            else:
                tbl = self._pf.read_row_group(rg, columns=["field", "term"])
                self.bytes_read += tbl.nbytes
                self.retained_bytes += tbl.nbytes
                seg = (np.asarray(tbl["field"]), np.asarray(tbl["term"]))
            self._dict_segs[rg] = seg
            if len(seg[0]):
                self._dict_first_keys[rg] = (str(seg[0][0]), str(seg[1][0]))
        return seg

    def _rg_of_row(self, row: int) -> int:
        return int(np.searchsorted(self._dict_rg_starts, row,
                                   side="right") - 1)

    def _dict_insertion(self, field: str, term: Optional[str],
                        side: str = "left", term_inf: int = 0) -> int:
        """Global insertion index of key (field, term) among the
        (field, term)-sorted dictionary rows — np.searchsorted semantics,
        loading only the O(log #rowgroups) probed dictionary row groups.
        ``term_inf``: -1 = before every term of the field, +1 = after."""
        nrg = len(self._dict_rg_starts) - 1
        if nrg == 0 or self._num_terms == 0:
            return 0

        def first_key_le(rg: int) -> bool:
            fk = self._dict_first_keys.get(rg)
            if fk is None:
                self._dict_seg(rg)
                fk = self._dict_first_keys[rg]
            fk_f, fk_t = fk
            if fk_f != field:
                return fk_f < field
            if term_inf > 0:
                return True
            if term_inf < 0:
                return False
            return fk_t < term or (fk_t == term and side == "right")

        a, b, r = 0, nrg - 1, -1
        while a <= b:
            m = (a + b) // 2
            if first_key_le(m):
                r, a = m, m + 1
            else:
                b = m - 1
        if r < 0:
            return 0
        f, t = self._dict_seg(r)
        s = int(self._dict_rg_starts[r])
        fi_lo = int(np.searchsorted(f, field, side="left"))
        fi_hi = int(np.searchsorted(f, field, side="right"))
        if term_inf > 0:
            return s + fi_hi
        if term_inf < 0:
            return s + fi_lo
        return s + fi_lo + int(np.searchsorted(t[fi_lo:fi_hi], term,
                                               side=side))

    def _field_bounds_for(self, field: str) -> tuple[int, int]:
        b = self._field_bounds_cache.get(field)
        if b is None:
            lo = self._dict_insertion(field, None, term_inf=-1)
            hi = self._dict_insertion(field, None, term_inf=+1)
            b = (lo, hi)
            self._field_bounds_cache[field] = b
        return b

    def dict_terms(self, rows: np.ndarray) -> np.ndarray:
        """Term strings for the given rows (object array), loading only
        the covering dictionary row groups."""
        rows = np.asarray(rows, np.int64)
        out = np.empty(len(rows), object)
        if not len(rows):
            return out
        rgs = np.searchsorted(self._dict_rg_starts, rows, side="right") - 1
        for rg in np.unique(rgs):
            _, t = self._dict_seg(int(rg))
            sel = rgs == rg
            out[sel] = t[rows[sel] - int(self._dict_rg_starts[rg])]
        return out

    def term_rows(self, field: str, terms: Sequence[str]) -> np.ndarray:
        """Dictionary row indices for the given terms; -1 when absent."""
        lo, hi = self._field_bounds_for(field)
        out = np.full(len(terms), -1, np.int64)
        if hi == lo:
            return out
        for i, term in enumerate(terms):
            pos = self._dict_insertion(field, term, side="left")
            if lo <= pos < hi:
                rg = self._rg_of_row(pos)
                _, t = self._dict_seg(rg)
                if str(t[pos - int(self._dict_rg_starts[rg])]) == term:
                    out[i] = pos
        return out

    def term_range_rows(self, field: str, lower: Optional[str], upper: Optional[str],
                        prefix: Optional[str] = None, regex: Optional[str] = None,
                        limit: Optional[int] = None) -> np.ndarray:
        """Row indices of terms in [lower, upper) / with prefix / matching
        regex — the term-dictionary automaton scan (wildcard/regex/prefix
        queries, list_terms)."""
        lo, hi = self._field_bounds_for(field)
        if hi == lo:
            return np.empty(0, np.int64)
        if prefix is not None:
            start = self._dict_insertion(field, prefix, side="left")
            end = self._dict_insertion(field, prefix + chr(0x10FFFF),
                                       side="left")
        else:
            start = lo if lower is None else \
                self._dict_insertion(field, lower, side="left")
            end = hi if upper is None else \
                self._dict_insertion(field, upper, side="left")
        rows = np.arange(start, end, dtype=np.int64)
        if regex is not None and len(rows):
            import re as _re

            pat = _re.compile(regex)
            terms = self.dict_terms(rows)
            mask = np.fromiter((pat.fullmatch(t) is not None
                                for t in terms), bool, count=len(rows))
            rows = rows[mask]
        if limit is not None:
            rows = rows[:limit]
        return rows

    def term_at(self, row: int) -> tuple[str, str]:
        rg = self._rg_of_row(int(row))
        f, t = self._dict_seg(rg)
        i = int(row) - int(self._dict_rg_starts[rg])
        return str(f[i]), str(t[i])

    # -- postings -----------------------------------------------------------

    def read_postings(self, rows: Iterable[int], with_positions: bool = False
                      ) -> dict[int, dict]:
        """Fetch decoded postings for dictionary rows. Reads only the parquet
        row groups that contain the requested rows."""
        rows = [int(r) for r in rows if r >= 0]
        need = [r for r in rows if r not in self._postings_cache
                or (with_positions and "positions" not in self._postings_cache[r])]
        if need:
            by_rg: dict[int, list[int]] = {}
            for r in need:
                by_rg.setdefault(r // TERMS_PER_ROW_GROUP, []).append(r)
            cols = ["doc_ids", "tfs", "block_last", "block_max_tf"]
            if with_positions:
                cols += ["positions", "pos_lens"]
            for rg, rlist in by_rg.items():
                tbl = self._row_group(rg, with_positions)
                base = rg * TERMS_PER_ROW_GROUP
                for r in rlist:
                    i = r - base
                    doc_ids = delta_decode(tbl["doc_ids"][i].as_py() or b"")
                    tf_buf = tbl["tfs"][i].as_py() or b""
                    tfs = (np.frombuffer(tf_buf, np.uint32).astype(np.int64)
                           if tf_buf else np.ones(len(doc_ids), np.int64))
                    ent = self._postings_cache.get(r, {})
                    before = sum(v.nbytes for v in ent.values())
                    ent.update(doc_ids=doc_ids, tfs=tfs,
                               block_last=np.frombuffer(tbl["block_last"][i].as_py() or b"", np.int32),
                               block_max_tf=np.frombuffer(tbl["block_max_tf"][i].as_py() or b"", np.int32))
                    if with_positions:
                        if self._legacy_positions:
                            pl = tbl["pos_lens"][i].as_py() or b""
                            po = tbl["positions"][i].as_py() or b""
                        else:
                            po, pl = self._positions_row(r)
                        ent["pos_lens"] = np.frombuffer(pl, np.int32)
                        ent["positions"] = np.frombuffer(po, np.int32)
                    self._postings_cache[r] = ent
                    self.retained_bytes += \
                        sum(v.nbytes for v in ent.values()) - before
        return {r: self._postings_cache[r] for r in rows}

    def _row_group(self, rg: int, with_positions: bool = False) -> "pa.Table":
        """Small LRU of decompressed posting row groups (the warmup-cache
        analog): repeated term lookups in the same region avoid re-reading
        and re-decompressing 2048-term column chunks."""
        key = (rg, with_positions and self._legacy_positions)
        tbl = self._rg_cache.get(key)
        if tbl is None:
            cols = ["doc_ids", "tfs", "block_last", "block_max_tf"]
            if "block_lens" in self._pf.schema_arrow.names:
                cols.append("block_lens")
            if "block_min_norm" in self._pf.schema_arrow.names:
                cols.append("block_min_norm")
            if with_positions and self._legacy_positions:
                cols += ["positions", "pos_lens"]
            tbl = self._pf.read_row_group(rg, columns=cols)
            self.bytes_read += tbl.nbytes
            self.retained_bytes += tbl.nbytes
            self._rg_cache[key] = tbl
            if len(self._rg_cache) > 4:
                dropped = self._rg_cache.pop(next(iter(self._rg_cache)))
                self.retained_bytes -= dropped.nbytes
        return tbl

    def _positions_row(self, row: int) -> tuple[bytes, bytes]:
        """(positions, pos_lens) buffers for one dictionary row from the
        sidecar file (small row groups + LRU); b'' when absent."""
        from quickwit_ray.index.format import POS_TERMS_PER_ROW_GROUP

        if self._pos_pf is None:
            p = os.path.join(self.split_dir, POSITIONS_FILE)
            if not _artifact_exists(p):
                return b"", b""
            self._pos_pf = _open_parquet(p)
        prg = row // POS_TERMS_PER_ROW_GROUP
        key = ("pos", prg)
        tbl = self._rg_cache.get(key)
        if tbl is None:
            tbl = self._pos_pf.read_row_group(prg)
            self.bytes_read += tbl.nbytes
            self.retained_bytes += tbl.nbytes
            self._rg_cache[key] = tbl
            if len(self._rg_cache) > 8:
                dropped = self._rg_cache.pop(next(iter(self._rg_cache)))
                self.retained_bytes -= dropped.nbytes
        i = row - prg * POS_TERMS_PER_ROW_GROUP
        return (tbl["positions"][i].as_py() or b"",
                tbl["pos_lens"][i].as_py() or b"")

    def read_postings_raw(self, row: int) -> dict:
        """Raw (undecoded) posting buffers for one dictionary row — the
        block-max / block-skip paths decode only the blocks they need.
        Cached per row: ``.as_py()`` copies the binary cell out of the
        Arrow column (several MB for a stopword), which dominated repeated
        hot-term queries before this LRU."""
        row = int(row)
        ent = self._raw_cache.get(row)
        if ent is not None:
            self._raw_cache.move_to_end(row)
            return ent
        rg = row // TERMS_PER_ROW_GROUP
        tbl = self._row_group(rg)
        if "block_lens" not in tbl.column_names:
            ent = {"block_lens": np.empty(0, np.int32)}
        else:
            i = row - rg * TERMS_PER_ROW_GROUP
            ent = {
                "doc_deltas": np.frombuffer(tbl["doc_ids"][i].as_py() or b"", np.int32),
                "tfs": np.frombuffer(tbl["tfs"][i].as_py() or b"", np.uint32),
                "block_last": np.frombuffer(tbl["block_last"][i].as_py() or b"", np.int32),
                "block_max_tf": np.frombuffer(tbl["block_max_tf"][i].as_py() or b"", np.int32),
                "block_lens": np.frombuffer(tbl["block_lens"][i].as_py() or b"", np.int32),
                # valid only when one entry per block (legacy splits and
                # legacy-mixed merges fail the length check and score unpruned)
                "block_min_norm": (
                    np.frombuffer(tbl["block_min_norm"][i].as_py() or b"", np.uint8)
                    if "block_min_norm" in tbl.column_names
                    else np.empty(0, np.uint8)),
            }
        self._raw_cache[row] = ent
        self.retained_bytes += sum(v.nbytes for v in ent.values())
        if len(self._raw_cache) > 512:
            _, dropped = self._raw_cache.popitem(last=False)
            self.retained_bytes -= sum(v.nbytes for v in dropped.values())
        return ent

    def raw_cached(self, row: int) -> Optional[dict]:
        """The already-decompressed raw entry, if any (the scorer prefers
        it over the hotcache: no read either way)."""
        return self._raw_cache.get(int(row))

    def hot_entry(self, row: int) -> Optional[dict]:
        """Hotcache entry for a dictionary row, or None. One tiny
        single-term row-group read per term — never touches the heavy
        posting row groups."""
        if self._hot_index is None:
            p = os.path.join(self.split_dir, HOTCACHE_FILE)
            if not _artifact_exists(p):
                self._hot_index = {}
                return None
            self._hot_pf = _open_parquet(p)
            rows = self._hot_pf.read(columns=["row"])  # tiny int column
            self._hot_index = {int(v): i for i, v
                               in enumerate(rows["row"].to_pylist())}
        i = self._hot_index.get(int(row))
        if i is None:
            return None
        ent = self._hot_cache.get(int(row))
        if ent is None:
            tbl = self._hot_pf.read_row_group(i)
            self.bytes_read += tbl.nbytes
            self.retained_bytes += tbl.nbytes
            ent = {
                "df": int(tbl["df"][0].as_py()),
                "block_last": np.frombuffer(tbl["block_last"][0].as_py()
                                            or b"", np.int32),
                "block_max_tf": np.frombuffer(tbl["block_max_tf"][0].as_py()
                                              or b"", np.int32),
                "block_lens": np.frombuffer(tbl["block_lens"][0].as_py()
                                            or b"", np.int32),
                "block_min_norm": np.frombuffer(
                    tbl["block_min_norm"][0].as_py() or b"", np.uint8),
                "sel": np.frombuffer(tbl["sel"][0].as_py() or b"", np.int32),
                "docs": np.frombuffer(tbl["docs"][0].as_py() or b"",
                                      np.int32),
                "tfs": np.frombuffer(tbl["tfs"][0].as_py() or b"",
                                     np.uint32),
                "has_tfs": bool(tbl["has_tfs"][0].as_py()),
            }
            self._hot_cache[int(row)] = ent
        return ent

    def read_postings_selected(self, row: int, cand_docs: np.ndarray
                               ) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tfs) of one posting list, decoding ONLY the 128-doc
        blocks that can contain any of ``cand_docs`` (sorted asc) — the
        skip-list read of a DAAT-AND: a rare term intersecting a stopword
        list touches a handful of the stopword's blocks instead of
        delta-decoding millions of postings. Falls back to a full decode
        for legacy splits without block_lens."""
        row = int(row)
        raw = self.read_postings_raw(row)
        lens = raw["block_lens"].astype(np.int64)
        if len(lens) == 0 or lens.sum() != self.df[row]:
            p = self.read_postings([row])[row]
            return p["doc_ids"], p["tfs"]
        bl = raw["block_last"].astype(np.int64)
        # candidate c lives in the first block whose last doc id >= c
        sel = np.unique(np.searchsorted(bl, np.asarray(cand_docs, np.int64),
                                        side="left"))
        sel = sel[sel < len(bl)]
        if len(sel) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        deltas = raw["doc_deltas"]
        tfs_all = raw["tfs"]
        ls = lens[sel]
        ss = starts[sel]
        total = int(ls.sum())
        seg_off = np.concatenate([[0], np.cumsum(ls)[:-1]])
        big_idx = np.repeat(ss - seg_off, ls) + np.arange(total)
        d = deltas[big_idx].astype(np.int64)
        cs = np.cumsum(d)
        seg_base = cs[seg_off] - d[seg_off]
        abs_prev = np.where(sel > 0, bl[sel - 1], 0)
        docs = cs - np.repeat(seg_base, ls) + np.repeat(abs_prev, ls)
        tfs = (np.ones(total, np.int64) if len(tfs_all) == 0
               else tfs_all[big_idx].astype(np.int64))
        return docs, tfs

    # -- per-doc columns ----------------------------------------------------

    def _load_fastfields(self) -> pa.Table:
        if self._fastfields is None:
            p = os.path.join(self.split_dir, FASTFIELDS_FILE)
            self._fastfields = (_read_parquet(p) if _artifact_exists(p)
                                else pa.table({}))
            self.bytes_read += self._fastfields.nbytes
            self.retained_bytes += self._fastfields.nbytes
        return self._fastfields

    def fieldnorm_ids(self, field: str) -> np.ndarray:
        if self._fieldnorms is None:
            p = os.path.join(self.split_dir, FIELDNORMS_FILE)
            self._fieldnorms = (_read_parquet(p) if _artifact_exists(p)
                                else pa.table({}))
            self.bytes_read += self._fieldnorms.nbytes
            self.retained_bytes += self._fieldnorms.nbytes
        col = f"norm_{field}"
        if col not in self._fieldnorms.column_names:
            return np.zeros(self.num_docs, np.uint8)
        return np.asarray(self._fieldnorms[col], np.uint8)

    def fast_field(self, name: str) -> np.ndarray:
        self._load_fastfields()
        if name not in self._fastfields.column_names:
            raise KeyError(f"no fast field {name!r} in split")
        col = self._fastfields[name].combine_chunks()
        if pa.types.is_timestamp(col.type):
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        try:
            return col.to_numpy(zero_copy_only=True)
        except pa.ArrowInvalid:
            return col.to_numpy(zero_copy_only=False)

    def fast_field_arrow(self, name: str) -> Optional[pa.Array]:
        """Raw Arrow fast column (nulls intact) — integer-exact access for
        u64/i64 values beyond float64 precision (terms-agg keys)."""
        self._load_fastfields()
        if name not in self._fastfields.column_names:
            return None
        ca = self._fastfields[name].combine_chunks()
        if isinstance(ca, pa.ChunkedArray):
            # a flat Array (ChunkedArray lacks is_valid and friends)
            ca = ca.chunk(0) if ca.num_chunks else pa.array([], ca.type)
        return ca

    def fast_field_valid(self, name: str) -> Optional[np.ndarray]:
        """Validity (non-null) mask of a fast field, or None if absent."""
        self._load_fastfields()
        if name not in self._fastfields.column_names:
            return None
        return np.asarray(self._fastfields[name].combine_chunks().is_valid())

    def docstore_units(self) -> list[dict]:
        """Ordered doc-store units, each covering a contiguous doc-id
        range: ``{parquet: path|None, num_docs, blobs: [spec]}``. Merged
        splits carry their sources' doc stores as hardlinked segment
        units (footer ``docstore_segments`` — the tantivy doc-store
        *stacking* analog: merge never decompresses stored fields);
        direct builds are one unit. Fat columns live in framed blob
        files (footer ``docstore_blobs`` / per-segment ``blobs``)."""
        return resolve_docstore_units(self.split_dir, self.footer,
                                      self.num_docs)

    def docstore_files(self) -> list[tuple[str, int]]:
        """Ordered ``(parquet path, num_docs)`` of units that have a
        parquet part (back-compat helper; full reads should use
        read_docstore_table)."""
        return [(u["parquet"], u["num_docs"]) for u in self.docstore_units()
                if u["parquet"]]

    def docstore_columns(self) -> list[str]:
        """Column names present in this split's doc store (mapped stored
        fields + the dynamic-mode catch-all columns + blob columns)."""
        if getattr(self, "_docstore_cols", None) is None:
            cols: list[str] = []
            for u in self.docstore_units():
                if u["parquet"]:
                    for name in pq.read_schema(u["parquet"]).names:
                        if name not in cols:
                            cols.append(name)
                for b in u["blobs"]:
                    if b["column"] not in cols:
                        cols.append(b["column"])
            self._docstore_cols = cols
        return self._docstore_cols

    def read_docstore_table(self, columns: Optional[list[str]] = None
                            ) -> pa.Table:
        """Full sequential doc-store read (delete rewrites, consolidating
        merges): parquet parts + scanned blob columns, row-aligned."""
        units = self.docstore_units()
        parts = []
        for u in units:
            t = None
            if u["parquet"]:
                cols = None
                if columns is not None:
                    present = set(pq.read_schema(u["parquet"]).names)
                    cols = [c for c in columns if c in present]
                if cols is None or cols:  # columns=[] -> 0-row table
                    t = _read_parquet(u["parquet"], columns=cols)
            for b in u["blobs"]:
                if columns is not None and b["column"] not in columns:
                    continue
                arr = BlobColumnReader(b["file"],
                                       b.get("type", "string")).scan()
                t = (pa.table({b["column"]: arr}) if t is None
                     else t.append_column(b["column"], arr))
            if t is None:
                raise ValueError("doc-store unit with no readable parts")
            parts.append(t)
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts, promote_options="default")

    def fetch_docs(self, doc_ids: np.ndarray, columns: Optional[list[str]] = None) -> pa.Table:
        """Doc-store point lookups for hit rendering (fetch_docs.rs:41-267).
        Reads only the parquet row groups containing the requested rows
        (doc id == row index across the ordered segments), so a top-k
        fetch touches a few compressed blocks, not the whole store."""
        ids = np.asarray(doc_ids, np.int64)
        # the cached grid shares ParquetFile + blob file handles; seeks
        # and reads on them are NOT thread-safe — serialize per reader
        # (concurrent requests still parallelize across splits). The
        # lock is created in __init__: lazy creation would race.
        with self._docstore_lock:
            return self._fetch_docs_locked(ids, columns)

    def _fetch_docs_locked(self, ids: np.ndarray,
                           columns: Optional[list[str]]) -> pa.Table:
        # (unit, row group) flattened into one global row-group grid,
        # cached on the reader (merged splits stack many segment files)
        cached = getattr(self, "_docstore_grid", None)
        if cached is None:
            units = self.docstore_units()
            unit_offs = np.concatenate(
                [[0], np.cumsum([u["num_docs"] for u in units])]
            ).astype(np.int64)
            grid: list[tuple[pq.ParquetFile, int]] = []
            g_starts: list[int] = []
            blob_readers: list[list[tuple[str, "BlobColumnReader"]]] = []
            for ui, u in enumerate(units):
                if u["parquet"]:
                    pf = _open_parquet(u["parquet"])
                    md = pf.metadata
                    acc = 0
                    for i in range(md.num_row_groups):
                        grid.append((pf, i))
                        g_starts.append(int(unit_offs[ui]) + acc)
                        acc += md.row_group(i).num_rows
                blob_readers.append(
                    [(b["column"],
                      BlobColumnReader(b["file"], b.get("type", "string")))
                     for b in u["blobs"]])
            cached = self._docstore_grid = (
                units, unit_offs, grid,
                np.asarray(g_starts, np.int64), blob_readers)
        units, unit_offs, grid, g_starts, blob_readers = cached
        unit_of = np.searchsorted(unit_offs, ids, side="right") - 1
        unit_has_pq = np.asarray([u["parquet"] is not None for u in units],
                                 bool)
        pq_mask = unit_has_pq[unit_of] if len(units) else \
            np.zeros(len(ids), bool)

        n = len(ids)
        combined: Optional[pa.Table] = None
        if pq_mask.any():
            sub_ids = ids[pq_mask]
            rg_of = np.searchsorted(g_starts, sub_ids, side="right") - 1
            out_parts: list[tuple[np.ndarray, Optional[pa.Table], int]] = []
            for rg in np.unique(rg_of):
                sel = rg_of == rg
                pf, local_rg = grid[int(rg)]
                cols = columns
                if cols is not None:
                    # tolerate columns a segment predates (schema widened
                    # by later dynamic ingests, or blob'd elsewhere):
                    # absent -> nulls on concat
                    present = set(pf.schema_arrow.names)
                    cols = [c for c in cols if c in present]
                idxs = np.nonzero(sel)[0]
                if cols is not None and not cols:
                    # none of the requested columns live in this group
                    out_parts.append((idxs, None, int(sel.sum())))
                    continue
                tbl = pf.read_row_group(local_rg, columns=cols)
                self.bytes_read += tbl.nbytes
                local = sub_ids[sel] - g_starts[rg]
                out_parts.append((idxs, tbl.take(pa.array(local)), 0))
            real = [t for _, t, _ in out_parts if t is not None]
            if real:
                unified = pa.unify_schemas([t.schema for t in real],
                                           promote_options="default")
                tables = [t if t is not None else
                          pa.table({f.name: pa.nulls(cnt, f.type)
                                    for f in unified}, schema=unified)
                          for _, t, cnt in out_parts]
                combined = pa.concat_tables(tables,
                                            promote_options="default")
                pos = np.concatenate([idxs for idxs, _, _ in out_parts])
                back = np.empty(len(pos), np.int64)
                back[pos] = np.arange(len(pos))
                combined = combined.take(pa.array(back))
            if combined is not None and not pq_mask.all():
                # splice null rows for ids whose unit is blobs-only
                full = np.full(n, -1, np.int64)
                full[pq_mask] = np.arange(int(pq_mask.sum()))
                combined = pa.concat_tables(
                    [combined,
                     pa.table({f.name: pa.nulls(1, f.type)
                               for f in combined.schema},
                              schema=combined.schema)])
                full[full < 0] = int(pq_mask.sum())
                combined = combined.take(pa.array(full))
        # overlay blob columns (per unit: each may blob different columns)
        blob_cols: list[str] = []
        for brs in blob_readers:
            for cname, _ in brs:
                if cname not in blob_cols and (columns is None
                                               or cname in columns):
                    blob_cols.append(cname)
        for cname in blob_cols:
            base: list = (combined[cname].to_pylist()
                          if combined is not None
                          and cname in combined.column_names
                          else [None] * n)
            vtype = "string"
            for ui in np.unique(unit_of):
                for bc, rd in blob_readers[int(ui)]:
                    if bc != cname:
                        continue
                    sel = unit_of == ui
                    local = ids[sel] - unit_offs[ui]
                    vals = rd.take(local)
                    self.bytes_read += vals.nbytes
                    vtype = rd.value_type
                    for j, v in zip(np.nonzero(sel)[0], vals.to_pylist()):
                        base[int(j)] = v
            arr = pa.array(base, pa.string() if vtype == "string"
                           else pa.binary())
            if combined is None:
                combined = pa.table({cname: arr})
            elif cname in combined.column_names:
                combined = combined.set_column(
                    combined.column_names.index(cname), cname, arr)
            else:
                combined = combined.append_column(cname, arr)
        if combined is None:
            combined = pa.table({})
        return combined
