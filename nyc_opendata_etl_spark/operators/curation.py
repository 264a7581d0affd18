"""Corpus-curation operators for LLM training-data pipelines:
decontamination, sequence packing, stratified sampling, frequent-n-gram
mining, and domain-mix accounting.

All deterministic (md5-ordered sampling, hash-sharded packing), so each
has an exact DuckDB oracle in ``queries/llm_ops.py``. Scale shapes:

* decontamination — shingle join against a (small) eval set: the eval
  side broadcasts; the train side never shuffles its full text, only
  (doc_id, shingle) pairs that survive the broadcast semi-join.
* packing — a global greedy pack is a single total order (one-partition
  window = non-starter at 100 TB); packing is therefore SHARDED: each
  hash shard packs independently in parallel, pack ids are
  (shard, local_pack). Training-batch assembly only needs *some*
  deterministic grouping under a token budget, not a globally minimal
  one — the standard distributed concession.
* stratified sampling — row_number per stratum over an md5 order: one
  shuffle on the stratum key; the md5 makes it a reproducible
  pseudo-random draw (no RNG state, same result on any cluster).
* n-gram mining — explode + count + top-k: partial aggregation
  map-side, TakeOrderedAndProject for the k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.hashing import md5_long
from nyc_opendata_etl_spark.operators.dedup import word_shingles
from nyc_opendata_etl_spark.operators.text import token_count, tokens


def shingles(col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles of the canonical text, as an array column
    (:func:`~nyc_opendata_etl_spark.operators.dedup.word_shingles`,
    optionally deduplicated per document)."""
    sh = word_shingles(col, n)
    return F.array_distinct(sh) if distinct else sh


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for every train doc, count distinct
    word-``n``-gram shingles it shares with ANY eval doc, and how many
    eval docs it hits. Docs with hits are contamination candidates.

    Eval sets are small (benchmarks), so the eval shingle side is
    broadcast — the train side's shingle explosion is filtered by the
    join before any shuffle. Output: (doc_id, n_shared_shingles,
    n_eval_docs_hit), contaminated docs only.
    """
    t = train.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    )
    e = eval_set.select(
        F.col(id_col).alias("eval_id"), F.explode(shingles(text_col, n)).alias("shingle")
    )
    return (
        t.join(F.broadcast(e), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
    )


def decontaminate_semantic(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_target_bytes: int = 16 << 20,
) -> DataFrame:
    """Semantic benchmark decontamination: for every train vector,
    count eval vectors whose rounded cosine similarity reaches
    ``threshold`` and report the best match. The embedding twin of
    :func:`decontaminate` — paraphrased benchmark leakage shares no
    3-gram shingle but sits next to the eval doc in embedding space
    (the contamination mode n-gram decontamination provably misses).

    Same asymmetric-scale contract as the shingle form: eval sets are
    benchmark suites (thousands of vectors — bounded by construction,
    NOT SF-scaling; an unbounded eval side belongs in
    :func:`~.similarity.knn_join`'s cell-pruned shuffle join instead).
    The eval matrix is collected once (the bounded collect),
    row-normalized, and broadcast; the train side is ONE
    ``mapInPandas`` scan — each Arrow batch unit-normalizes its rows
    and scores against the whole eval set as a float64 GEMM of UNIT
    vectors, in row chunks whose sims slab stays under
    ``chunk_target_bytes`` (default 16 MiB — cache-resident). The
    unit-vector form matters as much as the GEMM: dividing a full
    slab by ``np.outer(norms_a, norms_b)`` streams 3 extra
    slab-sized passes through memory, and with every core running
    one, the stage is memory-bandwidth-bound — measured 68 s for the
    100× replica's 196k×4k pairs vs ~7 s for normalize-then-GEMM
    with 16 MiB chunks (32 tasks, local[32]). Each batch aggregates
    its own rows' verdicts in place; every train row lives in exactly
    one batch, so the aggregation is complete map-side: ZERO shuffles
    of train data at any corpus size. (A first-cut expression-fold
    form — train ⋈ broadcast eval, per-pair ``F.aggregate`` cosine —
    was correct but >550 s on the same input.) Values equal the
    sequential-fold oracle after 6-dp rounding (the dedup_semantic
    GEMM precedent, driver-verified since r12).

    Exact by design (every train×eval pair is scored — IVF/LSH pruning
    trades recall, and a decontamination false negative is leaked eval
    data in the training set, the asymmetric-cost direction). Output:
    (``id_col``, n_eval_hits, max_cosine, best_eval_id), contaminated
    rows only; ``best_eval_id`` ties break to the smaller eval id at
    equal rounded similarity (duplicate benchmark vectors —
    deterministic on both engines). Zero-norm vectors on either side
    never hit (the NULL-cosine contract of :func:`~.similarity.cosine`).
    """
    import numpy as np

    spark = train_emb.sparkSession
    out_schema = (
        f"{id_col} long, n_eval_hits long, max_cosine double, best_eval_id long"
    )
    eval_rows = (
        eval_emb.select(F.col(id_col), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull())
        .collect()
    )
    # zero-norm eval vectors can never hit (NULL cosine) — drop them
    # here so they need no masking in the kernel
    eval_rows = [r for r in eval_rows if any(x != 0.0 for x in r[1])]
    if not eval_rows:
        return spark.createDataFrame([], out_schema)
    # ascending eval-id order makes np.argmax's first-max rule THE
    # smaller-id tie-break
    eval_rows.sort(key=lambda r: r[0])
    e_ids = np.asarray([r[0] for r in eval_rows], dtype=np.int64)
    e_mat = np.asarray([list(r[1]) for r in eval_rows], dtype=np.float64)
    e_unit_t = (e_mat / np.sqrt((e_mat * e_mat).sum(axis=1))[:, None]).T.copy()
    bcast = spark.sparkContext.broadcast((e_ids, e_unit_t))
    thr = float(threshold)
    n_eval = len(eval_rows)
    chunk = max(64, int(chunk_target_bytes // max(1, n_eval * 8)))

    def score(batches):
        import numpy as np
        import pandas as pd

        ev_ids, ev_unit_t = bcast.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            t_ids = pdf[id_col].to_numpy(dtype=np.int64)
            t_mat = np.asarray([np.asarray(v) for v in pdf[vec_col]], dtype=np.float64)
            t_norms = np.sqrt((t_mat * t_mat).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                t_unit = t_mat / t_norms[:, None]
            zero_row = t_norms == 0.0
            if zero_row.any():
                t_unit[zero_row] = 0.0
            outs = []
            for lo in range(0, len(t_ids), chunk):
                hi = min(lo + chunk, len(t_ids))
                sims = t_unit[lo:hi] @ ev_unit_t
                # zero-norm train rows → NULL cosine → never a hit,
                # whatever the threshold's sign
                zr = zero_row[lo:hi]
                if zr.any():
                    sims[zr, :] = -np.inf
                np.round(sims, 6, out=sims)
                sims += 0.0  # fold -0.0 to +0.0 (Spark round() parity)
                hits = sims >= thr
                n_hits = hits.sum(axis=1)
                keep = n_hits > 0
                if not keep.any():
                    continue
                sk = sims[keep]
                best = np.argmax(sk, axis=1)  # first max = smallest eval id
                outs.append(
                    pd.DataFrame(
                        {
                            id_col: t_ids[lo:hi][keep],
                            "n_eval_hits": n_hits[keep].astype(np.int64),
                            "max_cosine": sk[np.arange(len(best)), best],
                            "best_eval_id": ev_ids[best],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return (
        train_emb.select(F.col(id_col), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(score, out_schema)
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy sequence packing under a token budget, sharded for
    parallelism.

    Within a shard (``md5(doc_id) % n_shards``), docs are taken in
    doc_id order and a doc starts a new pack when the running token
    total before it has crossed a multiple of the budget — i.e.
    ``local_pack = floor(exclusive_cumsum / budget)``. One window per
    shard (parallel across shards), no global order anywhere.
    Output: (doc_id, shard, n_tokens, pack_id) with pack_id unique
    across shards (shard * 2^40 + local_pack — 2^32 would collide
    shard ranges at ~2e12 tokens/shard, inside the 100 TB design
    point; see pack_bins_decreasing).
    """
    with_tokens = docs.select(
        F.col(id_col),
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    local_pack = F.floor(cum_before / token_budget)
    return with_tokens.select(
        id_col,
        "shard",
        "n_tokens",
        (F.col("shard").cast("long") * F.lit(1 << 40) + local_pack).alias("pack_id"),
    )


def pack_bins_decreasing(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 512,
    n_shards: int = 8,
    sep_overhead: int = 1,
    cost_col: Column | None = None,
) -> DataFrame:
    """Tokenizer-aware sequence packing: decreasing-order CUMSUM
    CHUNKING under a token budget, sharded for parallelism.

    Differs from :func:`pack_sequences` on the two axes a training-batch
    assembler actually tunes:

    * **tokenizer-aware cost** — each doc costs its BPE-ish token count
      (:func:`~nyc_opendata_etl_spark.operators.text.bpe_ish_token_count`,
      the regex segmentation a subword tokenizer's token count tracks
      far better than whitespace words) **plus** ``sep_overhead`` for
      the separator/EOS token the tokenizer inserts between packed docs.
    * **decreasing order** — within a shard, docs pack in (cost DESC,
      id) order, so big docs concentrate in the earliest packs and the
      small-doc tail lands in packs of many near-budget-summing items.

    Packing discipline, stated honestly: this is NOT capacity-checked
    next-fit (a sequential recurrence no declarative plan can express —
    each bin's remaining capacity depends on every earlier decision).
    It is the distributed standard instead: packs are BUDGET-WIDTH
    WINDOWS of the per-shard cost cumsum axis — ``local_pack =
    floor(exclusive_cumsum / budget)`` assigns each doc to the window
    its span STARTS in. Consequences, exactly: a doc straddling a
    window boundary stays in the earlier pack, so ``pack_fill <
    budget + max(cost in pack)``; a doc spanning MULTIPLE windows
    leaves the intermediate pack ids empty (skipped, never reused) and
    the following pack starts mid-window, so it may fill short of the
    budget — fills sum exactly to the shard's total cost, there is no
    lost capacity, only window phase. Consumers that need hard caps
    chunk the straddling doc downstream, as every packing deployment
    does; the decreasing order keeps overshoot small exactly where
    packs are many-doc (tail packs straddle by at most a small doc).

    Same scale contract as :func:`pack_sequences`: a global pack is one
    total order (single-partition window — non-starter at 100 TB), so
    each ``md5(id) % n_shards`` shard packs independently;
    ``pack_id = shard * 2^40 + local_pack``. 2⁴⁰ packs/shard ≈ 5.6e14
    tokens per shard at budget 512 — two orders of magnitude past the
    100 TB corpus (a 2³² multiplier would collide shard 0's high packs
    into shard 1's range at ~2e12 tokens/shard). The pack-level
    fill/doc stats are one more window over ``pack_id`` — a strictly
    finer key than the shard, no skew (fills bounded as above).

    Output: (id, shard, cost, pack_id, pack_fill, pack_docs), one row
    per doc. Deterministic — exact DuckDB oracle in queries/llm_ops.py.
    """
    from nyc_opendata_etl_spark.operators.text import bpe_ish_token_count

    # cost_col is the tokenizer plug: any long-typed per-doc token
    # count (e.g. text.pandas_bpe_ish_token_count — the Arrow-batched
    # slot a real subword tokenizer drops into) replaces the default
    # expression cost; sep_overhead applies on top either way.
    base_cost = (
        cost_col if cost_col is not None else bpe_ish_token_count(text_col)
    )
    with_cost = docs.select(
        F.col(id_col),
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        (base_cost.cast("long") + F.lit(sep_overhead)).alias("cost"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("cost").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("cost").over(w), F.lit(0))
    packed = with_cost.select(
        id_col,
        "shard",
        "cost",
        (
            F.col("shard").cast("long") * F.lit(1 << 40)
            + F.floor(cum_before / token_budget)
        ).alias("pack_id"),
    )
    wp = Window.partitionBy("pack_id")
    return packed.select(
        id_col,
        "shard",
        "cost",
        "pack_id",
        F.sum("cost").over(wp).alias("pack_fill"),
        F.count(F.lit(1)).over(wp).alias("pack_docs"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into overlapping fixed-token windows (the
    context-window chunking step of a training/RAG pipeline).

    With stride ``s = chunk_tokens - overlap``, chunk ``i`` covers
    whitespace tokens ``[i*s, i*s + chunk_tokens)``; a doc of ``n``
    tokens yields ``1`` chunk if ``n <= chunk_tokens`` else
    ``ceil((n - chunk_tokens) / s) + 1`` — the last chunk is the first
    whose window reaches the end of the doc and may be short. Docs with
    no tokens yield no chunks.

    Scale shape: a narrow projection + ``explode`` — no shuffle, runs
    inside the scan stage, output ~``n/s`` rows per doc. The slice
    happens INSIDE the transform, BEFORE the explode (round-12 review):
    exploding bare chunk indices and slicing afterwards made Generate
    copy the doc's FULL token array into every generated UnsafeRow —
    ~``n/s``× memory-bandwidth amplification per doc inside the task;
    exploding pre-sliced (chunk_id, piece) structs materializes each
    token once plus the overlap. The token arrays never leave the
    executor; only the joined chunk text is emitted. Output: (id,
    chunk_id, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    base = (
        docs.select(F.col(id_col), tokens(text_col).alias("__toks__"))
        .withColumn("__n__", F.size("__toks__"))
        .where(F.col("__n__") > 0)
    )
    n_chunks = F.when(F.col("__n__") <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((F.col("__n__") - chunk_tokens + stride - 1) / stride) + 1
    )
    pieces = F.transform(
        F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long")),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(
                F.col("__toks__"), i.cast("int") * stride + 1, chunk_tokens
            ).alias("piece"),
        ),
    )
    exploded = base.select(id_col, F.explode(pieces).alias("c"))
    return exploded.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.piece").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.piece", " ").alias("chunk_text"),
    )


def stratified_sample(
    docs: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Exact k-per-stratum deterministic sample: rank by md5(id) within
    each stratum and keep the first k. Reproducible on any cluster (no
    RNG), one shuffle on the stratum key."""
    w = Window.partitionBy(stratum_col).orderBy(
        md5_long(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.select(stratum_col, id_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(stratum_col, id_col, F.col("rk").cast("int").alias("rk"))
    )


def ngram_topk(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 10,
) -> DataFrame:
    """Corpus-wide most frequent word n-grams (every occurrence counts,
    not per-doc distinct). Partial-aggregates map-side; the final top-k
    is a TakeOrderedAndProject, so only k rows reach the driver side of
    the sort."""
    grams = docs.select(
        F.explode(shingles(text_col, n, distinct=False)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(k)
    )


def domain_mix(
    docs: DataFrame,
    by: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus-composition accounting per domain cell: doc count, token
    mass, and each cell's fraction of all docs/tokens — the table a
    data-mixing policy consumes. One aggregate + a broadcast of the
    1-row global totals (scalar subquery shape, no second scan of the
    corpus)."""
    per_cell = docs.groupBy(*by).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col).cast("long")).alias("n_tokens"),
    )
    totals = per_cell.agg(
        F.sum("n_docs").alias("__td__"), F.sum("n_tokens").alias("__tt__")
    )
    return per_cell.crossJoin(F.broadcast(totals)).select(
        *by,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.col("__td__"), 6).alias("frac_docs"),
        F.round(F.col("n_tokens") / F.col("__tt__"), 6).alias("frac_tokens"),
    )


def temperature_mix(
    docs: DataFrame,
    by: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based sampling weights per domain cell (τ = 0.5, the
    multilingual-training upweighting rule): ``w_i ∝ p_i^τ`` where
    ``p_i`` is the cell's natural token share. τ < 1 flattens the
    distribution — low-resource domains oversample, head domains
    undersample — and the emitted ``oversample_factor = w_i / p_i`` is
    the per-domain epoch multiplier a sampler applies.

    Scale/determinism shape: one corpus aggregate (map-side combined)
    produces the per-cell token masses; everything after runs on the
    |cells|-row relation with broadcast 1-row totals. τ is fixed at 0.5
    so the power is ``sqrt`` — correctly rounded per IEEE 754, hence
    bit-identical across engines (a general ``pow`` is not) — and the
    weight denominator folds 9-dp-rounded terms through DECIMAL(28,12),
    keeping the normalization order-independent."""
    per_cell = docs.groupBy(*by).agg(
        F.sum(token_count(text_col).cast("long")).alias("n_tokens")
    )
    totals = per_cell.agg(F.sum("n_tokens").alias("__t__"))
    p = F.col("n_tokens") / F.col("__t__")
    term = per_cell.crossJoin(F.broadcast(totals)).withColumn(
        "__s__", F.round(F.sqrt(p), 9).cast("decimal(28,12)")
    )
    denom = term.agg(F.sum("__s__").alias("__d__"))
    w = F.col("__s__").cast("double") / F.col("__d__").cast("double")
    return term.crossJoin(F.broadcast(denom)).select(
        *by,
        "n_tokens",
        F.round(p, 6).alias("p_natural"),
        F.round(w, 6).alias("w_temperature"),
        F.round(w / p, 6).alias("oversample_factor"),
    )


def priority_sample(
    docs: DataFrame,
    k: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup): a weighted sample of k
    docs whose Horvitz–Thompson estimates ``max(w_i, τ)`` sum to a
    near-optimal unbiased estimate of any weighted subset total — the
    principled way to downsample a corpus by token mass while keeping
    token-count accounting correct.

    Each doc draws priority ``q_i = w_i / u_i`` (w = token count + 1,
    u ∈ (0,1] a deterministic md5-derived uniform); the sample is the
    top-k by priority and τ is the (k+1)-th priority. Classic A-ES
    weighted reservoir sampling orders by ``u^(1/w)`` — a transcendental
    ``pow`` whose last-ulp rounding is engine-dependent; priority
    sampling needs only one multiply and one divide (both correctly
    rounded per IEEE 754), so the scores — and hence the sample — are
    bit-identical on any engine, which is what makes the DuckDB oracle
    exact.

    Scale shape: scoring is expression-only map work; the top-(k+1) is
    a TakeOrderedAndProject (per-partition heaps, k+1 rows cross the
    exchange); τ broadcasts back as a 1-row relation. No full sort, no
    full shuffle.

    Reference scope: the reference has no sampler; this is engine
    surface for the 100 TB curation path (SURVEY §2 Part B).
    """
    from nyc_opendata_etl_spark.functions.hashing import MOD

    w = (token_count(text_col) + F.lit(1)).cast("long")
    scored = docs.select(
        F.col(id_col),
        (w - 1).alias("n_tokens"),
        (
            (w.cast("double") * F.lit(float(MOD + 1)))
            / (md5_long(F.col(id_col).cast("string")) + F.lit(1)).cast("double")
        ).alias("priority"),
    )
    top = scored.orderBy(F.desc("priority"), F.col(id_col)).limit(k + 1)
    # τ is the (k+1)-th priority — defined only when the corpus actually
    # has more than k docs. On an undersized corpus min(priority) over
    # the whole sample would INFLATE est_weight (priority > w by
    # construction), so fall back to 0 ⇒ est_weight = w, matching the
    # DLT estimator (and the oracle, whose rk = k+1 scalar subquery
    # returns NULL there and greatest() yields w).
    tau = top.agg(
        F.when(F.count(F.lit(1)) >= k + 1, F.min("priority"))
        .otherwise(F.lit(0.0))
        .alias("__tau__")
    )
    return (
        top.orderBy(F.desc("priority"), F.col(id_col))
        .limit(k)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("priority"), F.col(id_col))
            ),
        )
        .crossJoin(F.broadcast(tau))
        .select(
            F.col("rk").cast("int").alias("rk"),
            id_col,
            "n_tokens",
            F.round("priority", 6).alias("priority"),
            F.round(
                F.greatest((F.col("n_tokens") + 1).cast("double"), F.col("__tau__")), 6
            ).alias("est_weight"),
        )
    )


def realize_mix(
    docs: DataFrame,
    n_target: int = 200,
    by: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the temperature-mix policy into an actual document
    sample: each (lang, source) cell gets quota ``max(1, ⌊w_cell ·
    n_target⌋)`` docs, drawn deterministically by md5 rank within the
    cell — the step that turns :func:`temperature_mix`'s weight table
    into the epoch's training set.

    Scale shape: the policy table is |cells| rows and broadcasts onto
    the corpus (no shuffle for the quota lookup); the only shuffle is
    the per-cell rank window, keyed on the same columns as the policy
    aggregate. Quotas clamp at cell size implicitly (rank ≤ quota keeps
    at most the cell's rows).
    """
    policy = temperature_mix(docs, by=by, text_col=text_col).select(
        *by,
        F.greatest(
            F.lit(1), F.floor(F.col("w_temperature") * n_target)
        ).cast("int").alias("quota"),
    )
    w = Window.partitionBy(*by).orderBy(
        md5_long(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = docs.select(*by, id_col).withColumn(
        "rk", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(policy), list(by))
        .filter(F.col("rk") <= F.col("quota"))
        .select(*by, id_col, F.col("rk").cast("int").alias("rk"), "quota")
    )


def curriculum_order(
    docs: DataFrame,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum training order: easy-first within each domain,
    domains interleaved round-robin — with the GLOBAL position computed
    arithmetically, never by a global sort.

    Length curricula (short documents first) are the standard cheap
    difficulty proxy; interleaving domains keeps every training window
    mixed instead of concentrating one source. The naive realization —
    ``row_number() OVER (ORDER BY difficulty)`` — is a single total
    order through one task, the exact anti-pattern this engine bans at
    100 TB. Instead:

    * ``rk`` = rank within the domain by (difficulty, id) — one shuffle
      on the domain key, each domain ranks in parallel;
    * ``dom_idx`` = the domain's dense alphabetical index, from a
      broadcast dims-sized relation;
    * ``position = (rk - 1) * n_domains + dom_idx`` — pure arithmetic,
      computed scan-locally after the rank. Distinct by construction
      (rounds don't overlap: round r occupies [r*n, (r+1)*n)), and
      ordering by it IS the round-robin interleave. Once a smaller
      domain exhausts, its slots in later rounds are simply absent —
      gaps never reorder anything.

    A writer materializes the order with repartitionByRange(position) +
    sortWithinPartitions — a range exchange, still no single-task sort.
    Difficulty = BPE-ish token count (subword-tracking length).
    Deterministic — exact DuckDB oracle in queries/llm_ops.py.

    Output: (id, domain, difficulty, rk, position).
    """
    from nyc_opendata_etl_spark.operators.text import bpe_ish_token_count

    doms = (
        docs.select(F.col(by).alias("domain"))
        .distinct()
        .withColumn(
            "dom_idx",
            F.row_number().over(Window.orderBy("domain")).cast("long") - 1,
        )
    )
    n_doms = doms.agg(F.count(F.lit(1)).alias("n"))
    scored = docs.select(
        F.col(id_col),
        F.col(by).alias("domain"),
        bpe_ish_token_count(text_col).cast("long").alias("difficulty"),
    )
    w = Window.partitionBy("domain").orderBy("difficulty", id_col)
    ranked = scored.withColumn("rk", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(doms), "domain")
        .crossJoin(F.broadcast(n_doms))
        .select(
            id_col,
            "domain",
            "difficulty",
            "rk",
            ((F.col("rk") - 1) * F.col("n") + F.col("dom_idx")).alias(
                "position"
            ),
        )
    )


def shard_epoch(
    docs: DataFrame,
    seed: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seeded EPOCH SHUFFLE + sharding — the last step of
    a pretraining-data pipeline: assign every document a shard and a
    position within it such that the concatenation of shards in
    (shard, pos) order is a seed-keyed pseudo-random permutation of the
    corpus. Changing the seed re-permutes everything (a fresh epoch);
    the same seed reproduces the identical order on any cluster, any
    partitioning, any run — the md5-keyed determinism law, so training
    restarts and data-lineage audits see the exact byte order the
    original job produced.

    Shape: hv = md5_long(seed || "|" || id) gives each doc a stable
    draw; shard = hv % n_shards balances shards to corpus_size/n_shards
    (±md5 uniformity); pos = row_number over (shard ORDER BY hv, id).
    ONE shuffle (the per-shard sort window); no global total order
    anywhere — each shard sorts independently, so at 100 TB this is
    n_shards parallel sorts of corpus/n_shards rows each, not one
    driver-breaking global sort. (id breaks hv ties so the order is
    total even under md5-fold collisions, which the 10^9-fold makes
    likely at billions of docs.)"""
    hv = md5_long(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("hv", id_col)
    return (
        docs.select(id_col, hv.alias("hv"))
        .withColumn("shard", F.pmod(F.col("hv"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )
