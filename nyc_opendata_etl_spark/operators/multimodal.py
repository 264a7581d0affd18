"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested — schemas, batch iteration,
partition behavior, output typing. The *codec* step is a deterministic
stub (this container has no image/audio libraries): ``decode_image``
documents exactly where PIL/libvips/ffmpeg would plug in, and
``_fake_decode`` stands in with a reproducible transform so the
pipeline shape can be verified end-to-end (the brief's instruction:
stub the decode, make the plumbing real).

Scale notes: mapInPandas streams Arrow record batches — payload bytes
never materialize on the driver, and each task transforms its batches
independently (embarrassingly parallel, no shuffle). Metadata-only
operations (filtering by width, grouping by codec) stay native-columnar
and never touch the blobs, which is the point of splitting payload from
typed metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("codec", StringType()),      # e.g. jpeg / pcm16 / h264
        StructField("width", IntegerType()),     # images/video
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),  # video/audio samples
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
    ]
)


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    utf-8 bytes of the text prefix; metadata derived from content."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.when(F.col(id_col) % 3 == 0, "jpeg")
        .when(F.col(id_col) % 3 == 1, "pcm16")
        .otherwise("h264")
        .alias("codec"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        (F.length(text_col) % 30 + 1).cast("int").alias("n_frames"),
        F.encode(F.substring(F.col(text_col), 1, 64), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec. A real implementation
    would be e.g. ``PIL.Image.open(io.BytesIO(payload))`` — unavailable
    in this container, so features derive from raw bytes."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "last_byte": payload[-1] if payload else None,
        "byte_sum_mod": sum(payload) % 997,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda b: _fake_decode(bytes(b)))
            out = pd.DataFrame(list(feats))
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


# ──────────────────────────────────────────────────────────────────────
# REAL image decode (round 12): the container ships no image libs, but
# PNG is stdlib-decodable — zlib + struct + the filter algebra from the
# public spec (RFC 2083). synthesize_png_media builds small VALID
# grayscale PNGs whose pixel content is a closed-form function of the
# doc id (so the DuckDB oracle can replay the decoded statistics
# without decoding anything), and extract_image_features recovers the
# pixels FROM THE COMPRESSED BYTES inside the same mapInPandas kernel
# the fake-decode stub occupied — encode∘decode identity on the stats
# is exactly what the full value match proves.
# ──────────────────────────────────────────────────────────────────────

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode_gray(seed: int, width: int, height: int) -> bytes:
    """A valid 8-bit grayscale PNG; pixel(i) = (seed*7 + i*3) % 256 in
    row-major order (the closed form the oracle replays). Filter 0 on
    every scanline; one IDAT chunk; CRCs real."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    i = 0
    for _ in range(height):
        raw.append(0)  # filter type 0 (None)
        for _ in range(width):
            raw.append((seed * 7 + i * 3) % 256)
            i += 1
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_decode_gray(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode an 8-bit grayscale PNG: parse chunks, inflate IDAT, undo
    scanline filters (all five types, per the spec — bpp = 1). Returns
    (width, height, pixels row-major). Raises ValueError on anything
    that is not an 8-bit grayscale PNG — a decoder that guesses is
    worse than none in a curation pipeline."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if (depth, ctype) != (8, 0):
                raise ValueError(
                    f"unsupported PNG: bit_depth={depth} color_type={ctype} "
                    f"(this decoder handles 8-bit grayscale)"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    pixels: list[int] = []
    prev = [0] * stride
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = list(raw[off + 1 : off + 1 + stride])
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = []
            for x, v in enumerate(line):
                cur.append((v + (cur[x - 1] if x else 0)) % 256)
        elif ftype == 2:  # Up
            cur = [(v + prev[x]) % 256 for x, v in enumerate(line)]
        elif ftype == 3:  # Average
            cur = []
            for x, v in enumerate(line):
                a = cur[x - 1] if x else 0
                cur.append((v + (a + prev[x]) // 2) % 256)
        elif ftype == 4:  # Paeth
            cur = []
            for x, v in enumerate(line):
                a = cur[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                cur.append((v + pred) % 256)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        pixels.extend(cur)
        prev = cur
    return width, height, pixels


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ]
)


def synthesize_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, codec, payload): small REAL PNGs, dimensions and
    pixels closed-form in the id (w = id%13+1, h = id%11+1, seed =
    id%251) so decoded statistics are SQL-replayable. The payload is
    built worker-side in an Arrow-batched UDF — bytes never touch the
    driver."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _png(ids):  # pd.Series[int64] -> pd.Series[bytes]
        return ids.map(
            lambda i: png_encode_gray(
                int(i) % 251, int(i) % 13 + 1, int(i) % 11 + 1
            )
        )

    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("png").alias("codec"),
        _png(F.col(id_col)).alias("payload"),
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode in the Arrow/mapInPandas kernel: width/height/pixel
    stats come from parsing and inflating the PNG bytes, not from
    metadata columns (the media relation deliberately carries none).
    Same scale shape as extract_features: embarrassingly parallel in
    the scan stage, no shuffle, blobs never leave the executors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = png_decode_gray(bytes(blob))
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_pixels": len(px),
                        "pixel_sum": sum(px),
                        "px_min": min(px),
                        "px_max": max(px),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURE_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ahash", LongType()),
    ]
)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """64-bit AVERAGE-HASH perceptual fingerprint per image (r13): the
    classic aHash — nearest-neighbor downsample the DECODED pixels to a
    ``grid × grid`` patch, then one bit per cell set iff the cell is at
    or above the patch mean, packed row-major (bit 63 via its
    two's-complement value, the simhash packing). The mean comparison
    is pure integer math (``v * grid² >= sum``), so the hash is exactly
    replayable in SQL from a closed-form pixel function — no float
    boundary. Near-identical images (re-encodes, small edits, shifted
    exposure) collide or land within a few Hamming bits; pair
    generation is :func:`ahash_near_dup_pairs`.

    Scale shape: decode + hash run in the Arrow-batched scan-stage
    kernel; only (media_id, w, h, ahash) — 24 bytes — leaves the Python
    worker, never pixels. The kernel is the drop-in point for a real
    resampler (PIL/libvips) on non-synthetic corpora."""
    g2 = grid * grid

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = png_decode_gray(bytes(blob))
                cells = [
                    px[(r * h // grid) * w + (c * w // grid)]
                    for r in range(grid)
                    for c in range(grid)
                ]
                s = sum(cells)
                hv = 0
                for j, v in enumerate(cells):
                    if v * g2 >= s:
                        hv += -(1 << 63) if j == 63 else (1 << j)
                rows.append(
                    {"media_id": mid, "width": w, "height": h, "ahash": hv}
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AHASH_SCHEMA
    )


def _ahash_banded(reps: DataFrame, max_hamming: int, bands: int) -> DataFrame:
    """Explode the rep relation into band-bucket entries. Each row
    carries (id, ahash, band_idx, band_bits, rem): ``band_bits`` is
    band ``band_idx``'s segment and ``rem`` the COMPLEMENTARY bits
    (the other bands' bits compacted into one 64-seg-bit value) —
    precomputed here, where the band index is a literal, so the
    hot-bucket refinement can sub-band it without a data-dependent
    CASE."""
    seg = 64 // bands
    mask = (1 << seg) - 1

    def rem_bits(k: int):
        # bits below band k, then bits above it, compacted — pure
        # integer shifts/masks; widths stay under 63 bits so the
        # signed long never overflows (width = 64 - seg = 48 here).
        low_w = k * seg
        if k == bands - 1:
            return F.col("ahash").bitwiseAND(F.lit((1 << low_w) - 1))
        high = F.shiftrightunsigned(F.col("ahash"), (k + 1) * seg)
        if low_w == 0:
            return high
        return F.shiftleft(high, low_w).bitwiseOR(
            F.col("ahash").bitwiseAND(F.lit((1 << low_w) - 1))
        )

    return reps.select(
        "id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_idx"),
                        (
                            F.shiftright(F.col("ahash"), k * seg)
                            .bitwiseAND(F.lit(mask))
                        ).alias("band_bits"),
                        rem_bits(k).alias("rem"),
                    )
                    for k in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "ahash", "b.band_idx", "b.band_bits", "b.rem")


def _ahash_candidates(
    banded: DataFrame,
    max_hamming: int,
    bands: int,
    hot_bucket_cap: int,
    refine_levels: int = 2,
) -> DataFrame:
    """Candidate pairs from band buckets with the RECURSIVE HOT-BUCKET
    guard (r14 one level; r15 generalized per VERDICT r14 item 7): the
    plain bucket self-join's volume is Σ|bucket|² over
    (band_idx, band_bits) — a degenerate corpus (all-black thumbnails,
    blank pages) can concentrate one bucket and go quadratic, the skew
    shape the SNM family already guards. Unlike SNM's salt-split
    (which trades recall on hot blocks), the guard keeps recall EXACT
    by refining with further pigeonholes: for a pair agreeing on the
    key so far, its ≤ max_hamming differing bits all lie in the
    complementary ``rem`` bits, so splitting rem into
    ``max_hamming + 1`` segments guarantees ≥ 1 exactly-matching
    segment — inductively at EVERY depth. Buckets at or under
    ``hot_bucket_cap`` settle (join wholesale); hot buckets explode
    ×(max_hamming+1) into refined keys and recurse on the (shrinking)
    complement, collapsing Σ|bucket|² to Σ|deepest-bucket|².

    A hot SUB-bucket is adversarially constructible (hashes varying
    only in the 36 bits outside band 0 + rem segment 0 — 2³⁶ distinct
    values can share one level-1 key), hence the recursion. Depth is
    bounded twice: ``refine_levels`` (each level adds a window +
    explode over the normally-EMPTY hot relation — cheap at runtime
    but not free in the plan, so the default stops at 2), and the
    structural bound — once ``2^width <= hot_bucket_cap`` a bucket of
    DISTINCT hashes (collapse-first guarantees distinctness) cannot
    exceed the cap, and once ``width < max_hamming + 1`` it cannot be
    split; both settle the remaining rows. Pinned:
    test_ahash_recursive_guard_hot_sub_bucket.

    Mechanics: the refinement key accumulates as an array<long>
    ``kpath`` ([band_idx, band_bits, sub_idx, sub_bits, ...]); rows
    settling at different depths carry different-length kpaths, which
    is correct — hotness is a property of the bucket, so both members
    of a pair always settle at the SAME depth — and lets ONE
    self-join on kpath serve every depth. Each level's bucket-size
    window reuses the join's own hash partitioning."""
    n_sub = max_hamming + 1

    df = banded.select(
        "id",
        "ahash",
        F.array(
            F.col("band_idx").cast("long"), F.col("band_bits").cast("long")
        ).alias("kpath"),
        "rem",
    )
    width = 64 - 64 // bands
    settled = []
    level = 0
    while True:
        seg = width // n_sub
        can_split = (
            level < refine_levels
            and seg > 0
            and (1 << width) > hot_bucket_cap  # distinct hashes ≤ 2^width
        )
        if not can_split:
            # terminal level settles wholesale — no bucket-size window
            # (its result would be unused; computing it cost an extra
            # exchange stage on every query)
            settled.append(df.drop("rem"))
            break
        bw = Window.partitionBy("kpath")
        df = df.withColumn("bsize", F.count(F.lit(1)).over(bw))
        settled.append(
            df.filter(F.col("bsize") <= hot_bucket_cap).drop("bsize", "rem")
        )
        hot = df.filter(F.col("bsize") > hot_bucket_cap).drop("bsize")

        def seg_bits(j: int):
            w = width - (n_sub - 1) * seg if j == n_sub - 1 else seg
            return F.shiftrightunsigned(F.col("rem"), j * seg).bitwiseAND(
                F.lit((1 << w) - 1)
            )

        def comp_bits(j: int):
            # rem with segment j removed — pure shifts/masks; widths
            # stay ≤ 48 bits so the signed long never overflows
            if j == n_sub - 1:
                return F.col("rem").bitwiseAND(F.lit((1 << ((n_sub - 1) * seg)) - 1))
            low_w = j * seg
            high = F.shiftrightunsigned(F.col("rem"), (j + 1) * seg)
            if low_w == 0:
                return high
            return F.shiftleft(high, low_w).bitwiseOR(
                F.col("rem").bitwiseAND(F.lit((1 << low_w) - 1))
            )

        df = hot.select(
            "id",
            "ahash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.concat(
                                "kpath",
                                F.array(
                                    F.lit(j).cast("long"),
                                    seg_bits(j).cast("long"),
                                ),
                            ).alias("kpath"),
                            comp_bits(j).alias("rem"),
                        )
                        for j in range(n_sub)
                    ]
                )
            ).alias("s"),
        ).select("id", "ahash", "s.kpath", "s.rem")
        # branch j's true complement width varies (the last segment is
        # the widest); width - seg is the conservative max — a value
        # with fewer actual bits just has zero high bits, and its
        # differing bits still all lie below the bookkept width
        width -= seg
        level += 1

    allrows = settled[0]
    for s in settled[1:]:
        allrows = allrows.unionByName(s)
    a, b = allrows.alias("a"), allrows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.kpath") == F.col("b.kpath"))
            & (F.col("a.id") < F.col("b.id")),
            how="inner",
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )


def ahash_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    hot_bucket_cap: int = 4096,
    refine_levels: int = 2,
) -> DataFrame:
    """Image near-dup pairs from perceptual hashes via BANDED Hamming
    search (r13) — the multimodal member of the dedup family, under its
    two standing laws: COLLAPSE-FIRST (hash-identical images reduce to
    one min-id representative before any pairing — identical-hash
    enumeration is the group stage's job, and a g-copy group would
    otherwise emit C(g,2) pairs per band) and BANDED candidates (the
    64-bit hash splits into ``bands`` contiguous segments; two hashes
    within ``max_hamming`` bits differ in at most ``max_hamming`` bands,
    so with ``bands > max_hamming`` at least one band matches exactly —
    pigeonhole-EXACT recall, not probabilistic). Candidates bucket-join
    on (band_idx, band_bits), then verify ``bit_count(a XOR b) <=
    max_hamming``. Requires ``bands > max_hamming`` (asserted).

    Scale shape: one hash-collapse aggregate, a ``bands``-way explode
    of the REP relation (not the corpus), one bucket equi-join whose
    volume is Σ|bucket|² over 16-bit band values — bounded by the
    RECURSIVE HOT-BUCKET guard (r14/r15): buckets above
    ``hot_bucket_cap`` refine to a recall-exact sub-band key, hot
    SUB-buckets refine again up to ``refine_levels`` deep
    (:func:`_ahash_candidates`), so a degenerate corpus cannot go
    quadratic — then a map-side XOR
    verify. No all-pairs anywhere; output is invariant under duplicate
    multiplicity."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} must exceed max_hamming={max_hamming} for "
            f"pigeonhole-exact recall"
        )
    if 64 % bands != 0:
        # _ahash_banded's seg = 64 // bands would leave the top
        # 64 - bands*seg bits in NO band, silently breaking the
        # pigeonhole recall guarantee and the rem/sub-band arithmetic
        # (ADVICE r14).
        raise ValueError(
            f"bands={bands} must divide 64 evenly for full-hash "
            f"band coverage"
        )
    # localCheckpoint: reps is BOUNDED (one row per distinct hash) but
    # its lineage is the full decode+hash kernel scan, and the banded
    # self-join consumes it TWICE — without the checkpoint both join
    # sides re-execute the Arrow decode over the whole corpus (the
    # dedup_clusters_collapsed / ingest-batch lesson, image edition;
    # seen in the r13 PLANS.md dump as two ArrowEvalPython branches).
    reps = (
        hashes.groupBy("ahash")
        .agg(F.min("media_id").alias("id"), F.count(F.lit(1)).alias("n_images"))
        .localCheckpoint()
    )
    banded = _ahash_banded(reps, max_hamming, bands)
    cand = _ahash_candidates(
        banded, max_hamming, bands, hot_bucket_cap, refine_levels
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ahash_clusters(
    hashes: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    cc_kernel=None,
    hot_bucket_cap: int = 4096,
    refine_levels: int = 2,
) -> DataFrame:
    """IMAGE-level perceptual-dup clusters (r13): connected components
    over the aHash near-dup graph, expanded back to every member image
    — the collapse+expand envelope of duplicate_clusters_collapsed
    with perceptual hashes as the collapse key. Edges are (a) implicit
    identical-hash membership (every image ↔ its hash group's min-id
    rep) and (b) the banded cross-hash rep pairs at Hamming ≤
    ``max_hamming``; the CC kernel (default the O(log n)-round
    large-star/small-star) runs on the REP graph only, then membership
    joins each image to its rep's component. Output: (media_id,
    cluster_id = min member id) for every image in a genuine dup
    relation — hash groups of ≥2 images, or reps connected cross-hash;
    perceptually unique images are absent (the dedup_clusters
    contract).

    Scale shape: hashes (24 bytes/image) localCheckpointed — the
    decode-kernel lineage feeds three consumers (pairs, rep table,
    membership join); CC runs on |distinct hashes| nodes; the expand
    is one equi-join on the hash value."""
    from nyc_opendata_etl_spark.operators import dedup

    if cc_kernel is None:
        cc_kernel = dedup.duplicate_clusters_logstar
    hashes = hashes.select("media_id", "ahash").localCheckpoint()
    rep_pairs = ahash_near_dup_pairs(
        hashes,
        max_hamming=max_hamming,
        bands=bands,
        hot_bucket_cap=hot_bucket_cap,
        refine_levels=refine_levels,
    )
    rep_clusters = cc_kernel(rep_pairs).withColumnRenamed("doc_id", "rep")
    reps = hashes.groupBy("ahash").agg(
        F.min("media_id").alias("rep"),
        F.count(F.lit(1)).alias("n_images"),
    )
    mem = hashes.join(reps, "ahash")
    joined = mem.join(rep_clusters, "rep", "left")
    return (
        joined.filter(
            F.col("cluster_id").isNotNull() | (F.col("n_images") >= 2)
        )
        .select(
            "media_id",
            F.coalesce(F.col("cluster_id"), F.col("rep")).alias("cluster_id"),
        )
    )


# ──────────────────────────────────────────────────────────────────────
# REAL audio decode (late round 12): the PNG move replayed for audio.
# PCM WAV is stdlib-decodable — synthesize_wav_media builds small VALID
# RIFF/WAVE PCM16 payloads whose samples are a closed-form function of
# the id (SQL-replayable stats, same trick as png_encode_gray), and
# extract_audio_features recovers them FROM THE ENCODED BYTES via the
# stdlib ``wave`` module — a genuinely independent decoder (the encoder
# below writes the RIFF header by hand with ``struct``; encode and
# decode share no code, so the roundtrip is a real check, not an
# identity). Same scale shape: Arrow-batched mapInPandas in the scan
# stage, no shuffle, blobs never leave the executors; the kernel is the
# drop-in point for soundfile/ffmpeg.
# ──────────────────────────────────────────────────────────────────────


def wav_encode_pcm16(
    seed: int, n_samples: int, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """A valid PCM16 WAV; interleaved sample(i) =
    ((seed*31 + i*17) % 65536) - 32768 for i in frame-major order (the
    closed form an oracle replays). RIFF sizes exact, header by hand."""
    import struct

    total = n_samples * n_channels
    frames = b"".join(
        struct.pack("<h", ((seed * 31 + i * 17) % 65536) - 32768)
        for i in range(total)
    )
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode_pcm16(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV via the stdlib ``wave`` reader: returns
    (n_channels, sample_rate, interleaved samples). Raises ValueError on
    non-WAV bytes or non-16-bit PCM — a decoder that guesses is worse
    than none in a curation pipeline."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"unsupported WAV: sample_width={w.getsampwidth()} "
                    f"(this decoder handles 16-bit PCM)"
                )
            n_channels = w.getnchannels()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    # wave.Error for bad magic; the stdlib wave/chunk readers raise
    # bare EOFError on empty or header-truncated payloads and the
    # frame unpack raises struct.error on an odd-length buffer — all
    # are "not a PCM WAV" to the caller contract (ADVICE r12 low).
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    return n_channels, rate, samples


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),      # per channel
        StructField("duration_ms", LongType()),
        StructField("sample_sum", LongType()),
        StructField("s_min", IntegerType()),
        StructField("s_max", IntegerType()),
    ]
)


def synthesize_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, codec, payload): small REAL WAVs, frame count /
    channel layout / samples closed-form in the id (n = id%50+1,
    channels = id%2+1, seed = id%251, 8 kHz) so decoded statistics are
    SQL-replayable. Payloads are built worker-side in an Arrow-batched
    UDF — bytes never touch the driver."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _wav(ids):  # pd.Series[int64] -> pd.Series[bytes]
        return ids.map(
            lambda i: wav_encode_pcm16(
                int(i) % 251, int(i) % 50 + 1, n_channels=int(i) % 2 + 1
            )
        )

    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("pcm16").alias("codec"),
        _wav(F.col(id_col)).alias("payload"),
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL decode in the Arrow/mapInPandas kernel: channel count,
    rate, and sample stats come from parsing the WAV bytes, not from
    metadata columns. Embarrassingly parallel in the scan stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                nch, rate, samples = wav_decode_pcm16(bytes(blob))
                n = len(samples) // nch
                rows.append(
                    {
                        "media_id": mid,
                        "n_channels": nch,
                        "sample_rate": rate,
                        "n_samples": n,
                        "duration_ms": n * 1000 // rate,
                        "sample_sum": sum(samples),
                        "s_min": min(samples),
                        "s_max": max(samples),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, max_dim: int = 224) -> DataFrame:
    """'Resize' pass: real implementations decode + resample; the stub
    truncates payloads proportionally and rewrites metadata. Only image
    rows are touched; others pass through (payload untouched) — the
    filter happens BEFORE the Python boundary, so non-image blobs never
    cross into Arrow."""
    images = media.filter(F.col("kind") == "image")
    others = media.filter(F.col("kind") != "image")

    schema = media.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            scale = (max_dim / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            pdf = pdf.copy()
            pdf["width"] = (pdf["width"] * scale).astype("int32").clip(lower=1)
            pdf["height"] = (pdf["height"] * scale).astype("int32").clip(lower=1)
            # stub for decode→resample→re-encode:
            pdf["payload"] = [
                bytes(b)[: max(1, int(len(bytes(b)) * s))]
                for b, s in zip(pdf["payload"], scale)
            ]
            yield pdf

    return images.mapInPandas(batches, schema=schema).unionByName(others)


# ──────────────────────────────────────────────────────────────────────
# REAL video-container frame sampling (late round 12): the third
# modality gets the PNG/WAV treatment. No stdlib video codec exists, so
# the container is an MJPEG-style concatenation of VALID PNG frames
# ("MPNG") — the honest analog of frame-sampling a real container: the
# kernel must PARSE the byte stream into frames (walking each frame's
# chunk list to IEND — no length prefix to crib from), select every
# n-th frame, and decode real pixels for just the sampled ones. That
# decode-only-what-you-sample shape is the point at scale: a 1-in-30
# sample does 1/30th of the inflate work, the same reason production
# samplers seek to keyframes instead of decoding the whole stream.
# sample_frames (byte-slice stub) stays as-is — multimodal_frame_sample
# is registered against it; this path registers separately in r13.
# ──────────────────────────────────────────────────────────────────────


def mpng_encode(seed: int, n_frames: int, width: int, height: int) -> bytes:
    """A multi-frame container: ``n_frames`` concatenated valid PNGs;
    frame k's pixels follow png_encode_gray's closed form with seed
    ``(seed + 13*k) % 251`` (SQL-replayable per sampled frame)."""
    return b"".join(
        png_encode_gray((seed + 13 * k) % 251, width, height)
        for k in range(n_frames)
    )


def mpng_split(payload: bytes) -> list[bytes]:
    """Split a concatenated-PNG container into frames by walking each
    frame's chunk list to IEND (strict: bad signature, truncation, or
    trailing garbage raise ValueError — a sampler that guesses frame
    boundaries corrupts every downstream feature)."""
    import struct

    frames: list[bytes] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 8] != _PNG_SIG:
            raise ValueError(f"frame boundary at byte {pos} is not a PNG signature")
        cur = pos + 8
        while True:
            if cur + 8 > n:
                raise ValueError("truncated PNG frame (chunk header past end)")
            (ln,) = struct.unpack(">I", payload[cur : cur + 4])
            tag = payload[cur + 4 : cur + 8]
            cur += 12 + ln
            if cur > n:
                raise ValueError("truncated PNG frame (chunk body past end)")
            if tag == b"IEND":
                break
        frames.append(payload[pos:cur])
        pos = cur
    return frames


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ]
)


def synthesize_mpng_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, codec, payload): small REAL multi-frame containers,
    geometry closed-form in the id (frames = id%8+1, w = id%5+1,
    h = id%4+1, seed = id%251). Worker-side Arrow UDF, bytes never
    touch the driver."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _mpng(ids):  # pd.Series[int64] -> pd.Series[bytes]
        return ids.map(
            lambda i: mpng_encode(
                int(i) % 251, int(i) % 8 + 1, int(i) % 5 + 1, int(i) % 4 + 1
            )
        )

    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("mpng").alias("codec"),
        _mpng(F.col(id_col)).alias("payload"),
    )


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: parse the container, decode ONLY frames
    0, every_n, 2·every_n, … and emit one row per sampled frame with
    its decoded pixel statistics. Fan-out happens inside the Arrow
    kernel (frame rows are small; payload bytes never re-cross the
    boundary), so the shape stays scan-stage parallel with no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                frames = mpng_split(bytes(blob))
                for k in range(0, len(frames), every_n):
                    w, h, px = png_decode_gray(frames[k])
                    rows.append(
                        {
                            "media_id": mid,
                            "n_frames": len(frames),
                            "frame_idx": k,
                            "width": w,
                            "height": h,
                            "pixel_sum": sum(px),
                            "px_min": min(px),
                            "px_max": max(px),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=VIDEO_FRAME_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling for video rows: emit one row per sampled frame
    index (metadata fan-out stays columnar; the stub slices bytes)."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        F.col("payload"),
    ).withColumn(
        "frame_payload",
        F.expr("substring(payload, frame_idx + 1, 8)"),  # stub frame slice
    ).drop("payload")
