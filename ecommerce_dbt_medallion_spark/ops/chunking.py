"""Document chunking and sequence packing — the tokenize→window→pack
stages that turn a cleaned corpus into fixed-budget training sequences.

Reference analogue: none in the reference repo (mart scope); these are
the build brief's training-data-pipeline surface over ``documents``.

Scale notes (100 TB):
- ``doc_chunking`` is a per-row explode of a computed starts array —
  narrow, no shuffle, output size ~ input tokens / stride. The chunk
  rows inherit the scan's partitioning; no skew (chunk count is bounded
  by doc length).
- ``pack_sequences`` assigns each doc to a token-budget bin with a
  running-sum window per *shard* (doc_id % N_SHARDS). Shards bound the
  window's partition size: at 100 TB you raise N_SHARDS so each shard's
  cumulative-sum window stays executor-sized; packing quality is
  unaffected (bins never span shards by design). One shuffle on shard,
  one on (shard, bin).

Determinism: tokenization is the shared WORD_RE regex; shard and order
are pure functions of doc_id, so both engines produce identical bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

CHUNK_TOKENS = 32   # tokens per chunk
CHUNK_STRIDE = 24   # overlap = CHUNK_TOKENS - CHUNK_STRIDE

PACK_BUDGET = 2048  # tokens per packed sequence bin
N_SHARDS = 8        # parallel packing streams; raise with cluster size


def _docs_with_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").withColumn(
        "__words",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)),
    )


# ------------------------------------------------------------- chunking

def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token windows per document.

    Chunks start every CHUNK_STRIDE tokens and take CHUNK_TOKENS tokens
    (the final chunk may be shorter; empty docs yield no chunks).
    """
    docs = _docs_with_words(spark, sf_dir)
    n = F.size("__words")
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    chunked = docs.select(
        "doc_id",
        "lang",
        "__words",
        F.explode(starts).alias("chunk_start"),
    )
    chunk = F.slice(F.col("__words"), F.col("chunk_start") + 1, CHUNK_TOKENS)
    text = F.concat_ws(" ", chunk)
    return chunked.select(
        "doc_id",
        "lang",
        (F.col("chunk_start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(text).alias("chunk_hash"),
    )


def oracle_doc_chunking() -> str:
    return f"""
with w as (
    select doc_id, lang, regexp_extract_all(lower(text), '{WORD_RE}') as ws
    from documents
), starts as (
    select doc_id, lang, ws, unnest(range(0, len(ws), {CHUNK_STRIDE})) as chunk_start
    from w where len(ws) > 0
)
select doc_id, lang,
    cast(chunk_start / {CHUNK_STRIDE} as bigint) as chunk_id,
    cast(chunk_start as bigint) as chunk_start,
    cast(len(list_slice(ws, chunk_start + 1, chunk_start + {CHUNK_TOKENS})) as bigint)
        as n_chunk_tokens,
    md5(array_to_string(list_slice(ws, chunk_start + 1, chunk_start + {CHUNK_TOKENS}), ' '))
        as chunk_hash
from starts
"""


# -------------------------------------------------------------- packing

def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill sequence packing: docs stream in doc_id order
    within their shard and land in the PACK_BUDGET-token bin their
    running-sum start offset falls into.

    Output is one row per (shard, bin) with doc/token counts and the
    doc_id span — the manifest a training loader would read.
    """
    docs = _docs_with_words(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size("__words").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = docs.withColumn("__cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(float(PACK_BUDGET))),
    )
    return (
        binned.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("bin_id").cast("long").alias("bin_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            "first_doc_id",
            "last_doc_id",
            F.round(F.col("total_tokens") / F.lit(float(PACK_BUDGET)), 4).alias(
                "fill_ratio"
            ),
        )
    )


def oracle_pack_sequences() -> str:
    return f"""
with toks as (
    select doc_id,
        doc_id % {N_SHARDS} as shard,
        len(regexp_extract_all(lower(text), '{WORD_RE}')) as n_tokens
    from documents
), binned as (
    select doc_id, shard, n_tokens,
        cast(floor((sum(n_tokens) over (
                partition by shard order by doc_id
                rows between unbounded preceding and current row
            ) - n_tokens) / cast({PACK_BUDGET} as double)) as bigint) as bin_id
    from toks
)
select
    cast(shard as bigint) as shard,
    bin_id,
    cast(count(*) as bigint) as n_docs,
    cast(sum(n_tokens) as bigint) as total_tokens,
    min(doc_id) as first_doc_id,
    max(doc_id) as last_doc_id,
    round(cast(sum(n_tokens) as bigint) / cast({PACK_BUDGET} as double), 4) as fill_ratio
from binned
group by shard, bin_id
"""


# ------------------------------------------- best-fit-decreasing packing

def _bfd_assign(elig_desc, budget, min_t):
    """Best-fit-decreasing core over one shard's eligible docs.

    ``elig_desc`` is ``[(n_tokens, doc_id)]`` already sorted by
    (n_tokens desc, doc_id). Each doc goes into the open bin with the
    SMALLEST remaining capacity that fits (tie → lowest bin id), else a
    new bin. Returns ``(assignments, n_bins)`` where assignments is
    ``[(doc_id, n_tokens, bin_id)]`` in assignment order.

    Live-bin structure: a bisect-sorted list of (remaining, bin_id).
    ``bisect_left(live, (t, -1))`` lands on the smallest remaining >= t
    and, among equal remainings, the lowest bin_id — exactly the
    best-fit tie-break, in O(log B) compare work per doc (the pop/insort
    memmove is C-speed). A bin whose remaining drops below ``min_t``
    (the shard's smallest eligible doc — NOT the current doc: sizes
    DECREASE, so a bin that missed a large doc can still take a smaller
    one later) can never receive another doc and is simply not
    re-inserted, so the live list only shrinks-or-holds under pruning.
    Unlike the pre-round-13 linear rescan, the per-doc cost no longer
    degrades to O(live bins) when nothing retires (min_t = 1): the
    worst case is pinned by tests/test_properties.py::
    test_bfd_worst_case_no_retirement_stays_fast.
    """
    from bisect import bisect_left, insort

    live: list[tuple[int, int]] = []  # sorted (remaining, bin_id)
    out: list[tuple[int, int, int]] = []
    next_bin = 0
    for t, i in elig_desc:
        j = bisect_left(live, (t, -1))
        if j < len(live):
            rem, b = live.pop(j)
            rem -= t
        else:
            rem, b = budget - t, next_bin
            next_bin += 1
        if rem >= min_t:
            insort(live, (rem, b))
        out.append((i, t, b))
    return out, next_bin


def _pack_shard_pdf(pdf):
    """Exact-integer shard-local packing comparison (pure function of
    the shard's (doc_id, n_tokens) rows — deterministic, replayable).

    NF  = next-fit in doc_id order (the naive streaming packer:
          close the current bin when the doc doesn't fit).
    BFD = best-fit-decreasing via ``_bfd_assign`` (bisect-sorted live
          bins; see its docstring for the pruning invariant).
    Docs never span bins; empty docs and docs over PACK_BUDGET are
    excluded and counted (production splits oversize via doc_chunking).
    """
    import pandas as pd

    shard = int(pdf["shard"].iloc[0])
    toks = pdf["n_tokens"].astype("int64")
    ids = pdf["doc_id"].astype("int64")
    n_docs = len(pdf)
    elig = [
        (int(t), int(i))
        for t, i in zip(toks, ids)
        if 1 <= t <= PACK_BUDGET
    ]
    n_empty = int((toks == 0).sum())
    n_oversize = int((toks > PACK_BUDGET).sum())
    packed_tokens = sum(t for t, _ in elig)

    # next-fit, doc_id order
    nf_bins, rem = 0, 0
    for t, _ in sorted(elig, key=lambda p: p[1]):
        if t <= rem:
            rem -= t
        else:
            nf_bins += 1
            rem = PACK_BUDGET - t
    # best-fit-decreasing
    min_t = min((t for t, _ in elig), default=0)
    _, bfd_bins = _bfd_assign(
        sorted(elig, key=lambda p: (-p[0], p[1])), PACK_BUDGET, min_t
    )
    return pd.DataFrame(
        [
            {
                "shard": shard,
                "n_docs": n_docs,
                "n_empty": n_empty,
                "n_oversize": n_oversize,
                "packed_tokens": packed_tokens,
                "nf_bins": nf_bins,
                "nf_waste": nf_bins * PACK_BUDGET - packed_tokens,
                "bfd_bins": bfd_bins,
                "bfd_waste": bfd_bins * PACK_BUDGET - packed_tokens,
            }
        ]
    )


def pack_sequences_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#36c: best-fit-decreasing packing vs the naive next-fit packer,
    per shard — the padding-waste report that justifies a packing
    strategy before a training run (``pack_sequences`` is the
    contiguous manifest; this key measures how much padding a real
    packer saves).

    Spark shape: token counts are computed JVM-side (one projection);
    Python sees only (shard, doc_id, n_tokens) triplets through ONE
    Arrow ``applyInPandas`` over the shard groups — the packing
    recurrence is inherently sequential per shard, which is exactly the
    applyInPandas seam the build brief reserves for non-SQL-expressible
    state. At 100 TB the dial is N_SHARDS (raise with cluster size):
    state per task = live bins only (retired bins are counters), and
    the shuffle carries 3 small ints per doc, never text.

    Determinism / oracle: every quantity is an exact integer; the
    DuckDB oracle replays BOTH recurrences as recursive CTEs over the
    same (n_tokens desc, doc_id) / (doc_id) orders, and the final
    waste-saved ratio is ONE rounded IEEE division done OUTSIDE the
    Python worker (Spark F.round ⇔ DuckDB round parity; Python's
    half-even round would mismatch).
    """
    docs = _docs_with_words(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size("__words").alias("n_tokens"),
    )
    out = docs.groupBy("shard").applyInPandas(
        _pack_shard_pdf,
        schema=(
            "shard long, n_docs long, n_empty long, n_oversize long, "
            "packed_tokens long, nf_bins long, nf_waste long, "
            "bfd_bins long, bfd_waste long"
        ),
    )
    return out.select(
        "*",
        F.when(
            F.col("nf_waste") > 0,
            F.round(
                (F.col("nf_waste") - F.col("bfd_waste")).cast("double")
                / F.col("nf_waste").cast("double"),
                6,
            ),
        ).alias("waste_saved_r6"),
    )


# ------------------------------------ BFD manifest (round-14 queue)

def _pack_manifest_pdf(pdf):
    """One shard's BFD bin manifest: (shard, doc_id, bin_id, slot,
    n_tokens) per eligible doc — the trainer-consumable assignment
    (``_pack_shard_pdf`` reports the waste comparison; this emits WHERE
    each doc goes). Same ``_bfd_assign`` core, so the bin count always
    agrees with ``pack_sequences_bfd``'s bfd_bins."""
    import pandas as pd

    shard = int(pdf["shard"].iloc[0])
    elig = [
        (int(t), int(i))
        for t, i in zip(
            pdf["n_tokens"].astype("int64"), pdf["doc_id"].astype("int64")
        )
        if 1 <= t <= PACK_BUDGET
    ]
    min_t = min((t for t, _ in elig), default=0)
    out, _ = _bfd_assign(
        sorted(elig, key=lambda p: (-p[0], p[1])), PACK_BUDGET, min_t
    )
    slots: dict[int, int] = {}
    ids, toks, bins, slot_l = [], [], [], []
    for i, t, b in out:
        s = slots.get(b, 0)
        slots[b] = s + 1
        ids.append(i)
        toks.append(t)
        bins.append(b)
        slot_l.append(s)
    return pd.DataFrame(
        {
            "shard": pd.Series([shard] * len(ids), dtype="int64"),
            "doc_id": pd.Series(ids, dtype="int64"),
            "bin_id": pd.Series(bins, dtype="int64"),
            "slot": pd.Series(slot_l, dtype="int64"),
            "n_tokens": pd.Series(toks, dtype="int64"),
        }
    )


def pack_manifest_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built round 13 (VERDICT r12 #4a), registered at the round-14
    window head (VERDICT r13 #1): the best-fit-decreasing bin MANIFEST —
    one row per eligible doc giving (shard, bin_id, slot) — the
    artifact a training loader actually consumes (``pack_sequences_bfd``
    only reports how much padding BFD saves; this says which doc goes
    in which bin, in which order).

    Spark shape: identical to the report key — token counts JVM-side,
    ONE Arrow ``applyInPandas`` over shard groups carrying 3 ints per
    doc; output is doc-grain (the manifest IS per-doc data, so output
    size ∝ input rows, not state). N_SHARDS is the parallelism dial.

    Determinism / oracle: the assignment is a pure function of the
    shard's (n_tokens desc, doc_id) order with the smallest-remaining /
    lowest-bin-id tie-break; the DuckDB oracle replays the recurrence
    as a recursive CTE that carries the per-step assignment (bins are
    never removed from the oracle's rems list, so list position ==
    creation order == bin_id), and slot falls out as a row_number over
    (shard, bin_id) in step order. Every output is an exact integer.
    """
    docs = _docs_with_words(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size("__words").alias("n_tokens"),
    )
    return docs.groupBy("shard").applyInPandas(
        _pack_manifest_pdf,
        schema="shard long, doc_id long, bin_id long, slot long, n_tokens long",
    )


def oracle_pack_manifest_bfd() -> str:
    return f"""
with toks as materialized (
    select doc_id, doc_id % {N_SHARDS} as shard,
        len(regexp_extract_all(lower(text), '{WORD_RE}')) as n_tokens
    from documents
),
elig as (select * from toks where n_tokens >= 1 and n_tokens <= {PACK_BUDGET}),
ord_b as materialized (
    select shard, doc_id, n_tokens,
        row_number() over (partition by shard order by n_tokens desc, doc_id)
            as i,
        count(*) over (partition by shard) as m
    from elig
),
shards as materialized (select shard, max(m) as m from ord_b group by shard),
asg as (
    with recursive s(shard, i, m, rems, doc_id, n_tokens, bin_id) as (
        select shard, 0, m, cast([] as bigint[]),
            cast(null as bigint), cast(null as bigint), cast(null as bigint)
        from shards
        union all
        select s.shard, s.i + 1, s.m,
            case when list_min(list_filter(s.rems, r -> r >= o.n_tokens))
                     is null
                 then list_append(s.rems, {PACK_BUDGET} - o.n_tokens)
                 else list_transform(range(1, len(s.rems) + 1),
                        j -> case when j = list_position(s.rems,
                                list_min(list_filter(s.rems,
                                                     r -> r >= o.n_tokens)))
                                  then s.rems[j] - o.n_tokens
                                  else s.rems[j] end)
            end,
            o.doc_id, o.n_tokens,
            case when list_min(list_filter(s.rems, r -> r >= o.n_tokens))
                     is null
                 then cast(len(s.rems) as bigint)
                 else cast(list_position(s.rems,
                        list_min(list_filter(s.rems, r -> r >= o.n_tokens)))
                        - 1 as bigint)
            end
        from s join ord_b o on o.shard = s.shard and o.i = s.i + 1
        where s.i < s.m
    )
    select shard, i, doc_id, n_tokens, bin_id from s where i >= 1
)
select cast(shard as bigint) as shard,
    doc_id,
    bin_id,
    cast(row_number() over (partition by shard, bin_id order by i) - 1
         as bigint) as slot,
    cast(n_tokens as bigint) as n_tokens
from asg
"""


def oracle_pack_sequences_bfd() -> str:
    return f"""
with toks as materialized (
    select doc_id, doc_id % {N_SHARDS} as shard,
        len(regexp_extract_all(lower(text), '{WORD_RE}')) as n_tokens
    from documents
),
elig as (select * from toks where n_tokens >= 1 and n_tokens <= {PACK_BUDGET}),
ord_b as materialized (
    select shard, doc_id, n_tokens,
        row_number() over (partition by shard order by n_tokens desc, doc_id)
            as i,
        count(*) over (partition by shard) as m
    from elig
),
shards as materialized (select shard, max(m) as m from ord_b group by shard),
bfd as (
    with recursive s(shard, i, m, rems) as (
        select shard, 0, m, cast([] as bigint[]) from shards
        union all
        select s.shard, s.i + 1, s.m,
            case when list_min(list_filter(s.rems, r -> r >= o.n_tokens))
                     is null
                 then list_append(s.rems, {PACK_BUDGET} - o.n_tokens)
                 else list_transform(range(1, len(s.rems) + 1),
                        j -> case when j = list_position(s.rems,
                                list_min(list_filter(s.rems,
                                                     r -> r >= o.n_tokens)))
                                  then s.rems[j] - o.n_tokens
                                  else s.rems[j] end)
            end
        from s join ord_b o on o.shard = s.shard and o.i = s.i + 1
        where s.i < s.m
    )
    select shard, cast(len(rems) as bigint) as bfd_bins from s where i = m
),
ord_n as materialized (
    select shard, doc_id, n_tokens,
        row_number() over (partition by shard order by doc_id) as i,
        count(*) over (partition by shard) as m
    from elig
),
nf as (
    with recursive s(shard, i, m, bins, rem) as (
        select shard, 0, m, cast(0 as bigint), cast(0 as bigint) from shards
        union all
        select s.shard, s.i + 1, s.m,
            case when o.n_tokens <= s.rem then s.bins else s.bins + 1 end,
            case when o.n_tokens <= s.rem then s.rem - o.n_tokens
                 else {PACK_BUDGET} - o.n_tokens end
        from s join ord_n o on o.shard = s.shard and o.i = s.i + 1
        where s.i < s.m
    )
    select shard, bins as nf_bins from s where i = m
),
agg as (
    select shard,
        cast(count(*) as bigint) as n_docs,
        cast(sum(case when n_tokens = 0 then 1 else 0 end) as bigint)
            as n_empty,
        cast(sum(case when n_tokens > {PACK_BUDGET} then 1 else 0 end)
             as bigint) as n_oversize,
        cast(sum(case when n_tokens >= 1 and n_tokens <= {PACK_BUDGET}
                 then n_tokens else 0 end) as bigint) as packed_tokens
    from toks group by shard
)
select cast(a.shard as bigint) as shard,
    a.n_docs, a.n_empty, a.n_oversize, a.packed_tokens,
    coalesce(nf.nf_bins, 0) as nf_bins,
    coalesce(nf.nf_bins, 0) * {PACK_BUDGET} - a.packed_tokens as nf_waste,
    coalesce(b.bfd_bins, 0) as bfd_bins,
    coalesce(b.bfd_bins, 0) * {PACK_BUDGET} - a.packed_tokens as bfd_waste,
    case when coalesce(nf.nf_bins, 0) * {PACK_BUDGET} - a.packed_tokens > 0
         then round(
            cast((coalesce(nf.nf_bins, 0) * {PACK_BUDGET} - a.packed_tokens)
                 - (coalesce(b.bfd_bins, 0) * {PACK_BUDGET} - a.packed_tokens)
                 as double)
            / cast(coalesce(nf.nf_bins, 0) * {PACK_BUDGET} - a.packed_tokens
                   as double), 6)
    end as waste_saved_r6
from agg a
left join bfd b using (shard)
left join nf using (shard)
"""
