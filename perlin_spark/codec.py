"""Delta + variable-byte posting-list codec (numpy-vectorized).

Mirrors the storage contract of perlin-core's vint-encoded posting lists
(consumed by the reference via ``PostingDecoder`` imports,
``/root/reference/src/query/mod.rs:4-5``; dependency declared at
``/root/reference/Cargo.toml:13-14``).  The reference stores postings as
compressed, seekable streams; we store them as binary blobs inside a
DataFrame column so Spark can shuffle/persist them like any other data.

Blob layout (little-endian)::

    uint32  n_blocks
    n_blocks * block header (fixed 24 bytes each):
        int64   first_doc   -- absolute doc_id of the first posting in block
        int32   count       -- postings in this block (<= block_size)
        int32   max_tf      -- block-max term frequency (block-max WAND bound)
        int32   gaps_len    -- payload bytes of the varbyte gap section
        int32   tfs_len     -- payload bytes of the varbyte tf section
    payloads, per block, concatenated:
        varbyte(doc_id deltas)  -- first delta is (doc - first_doc) == 0
        varbyte(tf values)

Fixed-size headers make block skipping a single ``np.frombuffer`` — the
scorer reads every block header at once, prunes blocks by doc-range or by
block-max impact, and only varbyte-decodes surviving blocks.  This is the
"lazy, ten-at-a-time" decoding discipline of the reference
(``/root/reference/src/lib.rs:4-5``) re-expressed for vectorized execution.

Varbyte: canonical LEB128-style 7-bit groups, little-endian, MSB is the
continuation bit.  Both encode and decode are numpy-vectorized: the loops
below run over *byte positions* (<= 10) not over values.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_HEADER_DTYPE = np.dtype(
    [
        ("first_doc", "<i8"),
        ("count", "<i4"),
        ("max_tf", "<i4"),
        ("gaps_len", "<i4"),
        ("tfs_len", "<i4"),
    ]
)
_THRESHOLDS = [1 << (7 * i) for i in range(1, 10)]


def _varbyte_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varbyte encode -> (uint8 buffer, per-value byte counts)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= np.uint64(t)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for p in range(10):
        mask = nbytes > p
        if not mask.any():
            break
        byte = (v[mask] >> np.uint64(7 * p)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > p).astype(np.uint8) << 7
        out[offsets[mask] + p] = byte.astype(np.uint8) | cont
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a non-negative int64/uint64 array."""
    out, _ = _varbyte_encode_arr(values)
    return out.tobytes()


def varbyte_decode(buf: bytes, n_values: int | None = None) -> np.ndarray:
    """Vectorized varbyte decode -> int64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.int64)
    is_end = (b & 0x80) == 0
    value_id = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_end[:-1], out=value_id[1:])
    end_pos = np.flatnonzero(is_end)
    starts = np.empty(end_pos.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = end_pos[:-1] + 1
    pos_in_val = np.arange(b.size, dtype=np.int64) - starts[value_id]
    contrib = (b & 0x7F).astype(np.int64) << (7 * pos_in_val)
    if pos_in_val.max() <= 6:
        # every value fits in 49 bits -> float64 bincount is exact
        vals = np.bincount(value_id, weights=contrib, minlength=end_pos.size)
        out = vals.astype(np.int64)
    else:
        out = np.zeros(end_pos.size, dtype=np.int64)
        np.add.at(out, value_id, contrib)
    if n_values is not None and out.size != n_values:
        raise ValueError(f"decoded {out.size} values, expected {n_values}")
    return out


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = BLOCK_SIZE
) -> bytes:
    """Encode sorted (doc_id, tf) postings into a block blob."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if doc_ids.size != tfs.size:
        raise ValueError("doc_ids and tfs must have equal length")
    if doc_ids.size == 0:
        return np.uint32(0).tobytes()
    if doc_ids.size > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")
    n = doc_ids.size
    n_blocks = (n + block_size - 1) // block_size
    headers = np.zeros(n_blocks, dtype=_HEADER_DTYPE)
    payloads: list[bytes] = []
    for i in range(n_blocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        d, t = doc_ids[lo:hi], tfs[lo:hi]
        gaps = np.empty(d.size, dtype=np.int64)
        gaps[0] = 0
        np.subtract(d[1:], d[:-1], out=gaps[1:])
        g_buf = varbyte_encode(gaps)
        t_buf = varbyte_encode(t)
        headers[i] = (int(d[0]), d.size, int(t.max()), len(g_buf), len(t_buf))
        payloads.append(g_buf)
        payloads.append(t_buf)
    return np.uint32(n_blocks).tobytes() + headers.tobytes() + b"".join(payloads)


def encode_postings_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[bytes]:
    """Encode MANY groups at once: one vectorized varbyte pass over the
    concatenated arrays, then per-group byte slicing.

    ``doc_ids``/``tfs`` are the concatenation of all groups (each group's
    docs sorted ascending); ``starts``/``ends`` delimit groups.  Groups that
    span more than one block fall back to :func:`encode_postings`.  This is
    the hot path of the merge stage — reduce partitions carry 1e5+ tiny
    groups and per-group numpy scaffolding dominates otherwise.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    counts = ends - starts

    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[starts] = 0  # first posting of each group is stored as delta 0

    g_buf, g_nbytes = _varbyte_encode_arr(gaps)
    t_buf, t_nbytes = _varbyte_encode_arr(tfs)
    g_off = np.concatenate(([0], np.cumsum(g_nbytes)))
    t_off = np.concatenate(([0], np.cumsum(t_nbytes)))
    max_tf = np.maximum.reduceat(tfs, starts) if starts.size else np.zeros(0, np.int64)

    one = np.uint32(1).tobytes()
    g_bytes = g_buf.tobytes()
    t_bytes = t_buf.tobytes()
    blobs: list[bytes] = []
    header = np.zeros(1, dtype=_HEADER_DTYPE)
    for i in range(starts.size):
        lo, hi = starts[i], ends[i]
        n = int(counts[i])
        if n > block_size:
            blobs.append(
                encode_postings(doc_ids[lo:hi], tfs[lo:hi], block_size=block_size)
            )
            continue
        glo, ghi = int(g_off[lo]), int(g_off[hi])
        tlo, thi = int(t_off[lo]), int(t_off[hi])
        header[0] = (int(doc_ids[lo]), n, int(max_tf[i]), ghi - glo, thi - tlo)
        blobs.append(one + header.tobytes() + g_bytes[glo:ghi] + t_bytes[tlo:thi])
    return blobs


def encode_postings_column(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Encode MANY groups into one concatenated buffer: fully vectorized.

    Returns ``(values, offsets)`` — ``values`` is every group's blob
    back-to-back (uint8) and ``offsets`` (int64, len n_groups+1) delimits
    them, i.e. exactly the layout of an Arrow binary column.  Unlike
    :func:`encode_postings_batch` there is NO per-group Python loop: block
    decomposition, header packing, and payload placement are all numpy
    index arithmetic + two byte scatters.  The per-group loop was ~13 us x
    millions of groups — the single hottest cost of the whole index build.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n_groups = starts.size
    if n_groups == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    counts = ends - starts

    # --- block decomposition (a group spans ceil(count / block_size) blocks)
    nb = (counts + block_size - 1) // block_size
    nb_total = int(nb.sum())
    first_block = np.concatenate(([0], np.cumsum(nb)[:-1]))
    g_of_block = np.repeat(np.arange(n_groups, dtype=np.int64), nb)
    b_in_g = np.arange(nb_total, dtype=np.int64) - first_block[g_of_block]
    block_start = starts[g_of_block] + b_in_g * block_size
    block_end = np.minimum(block_start + block_size, ends[g_of_block])
    bcount = block_end - block_start

    # --- varbyte payloads over the full concatenation (one pass each)
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[block_start] = 0  # every block's first posting is stored as delta 0
    g_buf, g_nbytes = _varbyte_encode_arr(gaps)
    t_buf, t_nbytes = _varbyte_encode_arr(tfs)
    g_off = np.concatenate(([0], np.cumsum(g_nbytes)))
    t_off = np.concatenate(([0], np.cumsum(t_nbytes)))
    gl_b = g_off[block_end] - g_off[block_start]
    tl_b = t_off[block_end] - t_off[block_start]

    # --- output layout
    pay_b = gl_b + tl_b
    pay_g = np.add.reduceat(pay_b, first_block)
    blob_len = 4 + _HEADER_DTYPE.itemsize * nb + pay_g
    offsets = np.concatenate(([0], np.cumsum(blob_len)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)

    # n_blocks (u32) at each blob start
    nb_bytes = nb.astype("<u4").view(np.uint8).reshape(n_groups, 4)
    dest = offsets[:-1, None] + np.arange(4)
    out[dest.ravel()] = nb_bytes.ravel()

    # fixed-size headers, packed once and scattered
    headers = np.zeros(nb_total, dtype=_HEADER_DTYPE)
    headers["first_doc"] = doc_ids[block_start]
    headers["count"] = bcount
    headers["max_tf"] = np.maximum.reduceat(tfs, block_start)
    headers["gaps_len"] = gl_b
    headers["tfs_len"] = tl_b
    hsize = _HEADER_DTYPE.itemsize
    hdr_dest = offsets[g_of_block] + 4 + hsize * b_in_g
    dest = hdr_dest[:, None] + np.arange(hsize)
    out[dest.ravel()] = headers.view(np.uint8).reshape(nb_total, hsize).ravel()

    # payload placement: per block, [gaps][tfs], blocks in order per group
    pay_area = offsets[:-1] + 4 + hsize * nb
    pay_cum = np.concatenate(([0], np.cumsum(pay_b)[:-1]))
    pay_before = pay_cum - pay_cum[first_block[g_of_block]]
    gap_dest_b = pay_area[g_of_block] + pay_before
    tf_dest_b = gap_dest_b + gl_b
    # every byte of g_buf/t_buf belongs to exactly one block (blocks tile
    # the input), so a per-block shift expanded per byte places them all
    out[np.arange(g_buf.size) + np.repeat(gap_dest_b - g_off[block_start], gl_b)] = g_buf
    out[np.arange(t_buf.size) + np.repeat(tf_dest_b - t_off[block_start], tl_b)] = t_buf
    return out, offsets


def read_headers(blob: bytes) -> np.ndarray:
    """Return the structured block-header array without decoding payloads."""
    n_blocks = int(np.frombuffer(blob[:4], dtype=np.uint32)[0])
    return np.frombuffer(blob, dtype=_HEADER_DTYPE, count=n_blocks, offset=4)


def decode_postings(
    blob: bytes, block_mask: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Decode (doc_ids, tfs) from a blob; ``block_mask`` selects blocks.

    Skipped blocks (mask False) are never varbyte-decoded — this is the
    seek/skip primitive the scorer's block-max pruning builds on.
    """
    headers = read_headers(blob)
    n_blocks = headers.size
    if n_blocks == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()
    if block_mask is None:
        block_mask = np.ones(n_blocks, dtype=bool)
    payload_off = 4 + n_blocks * _HEADER_DTYPE.itemsize
    block_bytes = headers["gaps_len"].astype(np.int64) + headers["tfs_len"]
    block_off = payload_off + np.concatenate(([0], np.cumsum(block_bytes)[:-1]))
    docs_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    for i in np.flatnonzero(block_mask):
        h = headers[i]
        off = int(block_off[i])
        g_end = off + int(h["gaps_len"])
        gaps = varbyte_decode(blob[off:g_end], int(h["count"]))
        tfs = varbyte_decode(blob[g_end : g_end + int(h["tfs_len"])], int(h["count"]))
        docs_out.append(np.cumsum(gaps) + h["first_doc"])
        tfs_out.append(tfs)
    if not docs_out:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()
    return np.concatenate(docs_out), np.concatenate(tfs_out)


def decode_block_count(blob: bytes) -> int:
    """Total postings in the blob, from headers only (no payload decode)."""
    return int(read_headers(blob)["count"].sum())


def splice_blobs(blobs: list[bytes]) -> bytes:
    """Concatenate blobs whose doc ranges are DISJOINT and given in
    ascending order, WITHOUT decoding: block headers carry absolute
    ``first_doc`` and per-block payload lengths, so the merged blob is
    just [sum n_blocks][all headers in order][all payloads in order].
    This is what makes the partial-index merge byte-splicing instead of
    decode+re-encode (the map-side-partials build, SURVEY §3.1)."""
    headers: list[bytes] = []
    payloads: list[bytes] = []
    total = 0
    for blob in blobs:
        nb = int(np.frombuffer(blob[:4], dtype=np.uint32)[0])
        total += nb
        cut = 4 + nb * _HEADER_DTYPE.itemsize
        headers.append(blob[4:cut])
        payloads.append(blob[cut:])
    return np.uint32(total).tobytes() + b"".join(headers) + b"".join(payloads)


def merge_blobs(blobs: list[bytes], block_size: int = BLOCK_SIZE) -> bytes:
    """Merge blobs whose doc-id ranges are disjoint and given in order.

    Used by the two-stage salted merge (SURVEY.md §2.2 #14): stage-1 blobs
    cover contiguous disjoint doc ranges, so merging is a re-block of the
    concatenated decoded arrays (cheap, bounded by the shard size).
    """
    parts = [decode_postings(b) for b in blobs]
    docs = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64)
    tfs = np.concatenate([p[1] for p in parts]) if parts else np.zeros(0, np.int64)
    return encode_postings(docs, tfs, block_size=block_size)
