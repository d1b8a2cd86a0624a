"""BPE tokenizer training + encoding (round 10): learn byte-pair
merges from the corpus word-frequency table and report what applying
them does to the corpus — the tokenizer-TRAINING stage of an LLM data
pipeline (vocab.py induces a word vocabulary; this learns the subword
merges a BPE tokenizer is actually built from, then measures the
compression they buy per source). Reference scope: the
LLM-data-pipeline mandate; no reference-file counterpart — engine
depth beyond it.

Algorithm (textbook BPE, Sennrich et al. 2016, learned on word types
weighted by frequency):

1. word-frequency table: lowercased ``\\w+`` tokens (same tokenization
   as ops/vocab.py) → (word, freq). This is the ONLY corpus-scale pass;
   everything after runs on the vocabulary (word types ≪ tokens), which
   is checkpointed once.
2. per round r = 1..BPE_ROUNDS: count adjacent symbol pairs over all
   word types, weighted by freq (overlapping occurrences count, the
   standard adjacent-pair statistic); pick the most frequent pair
   (ties → lexicographically smallest); merge it everywhere by
   rewriting the pair to a fresh single-character sentinel chr(r).
   Every symbol is always exactly ONE character, so "adjacent symbol
   pair" stays a 2-char substring window in every round — no arrays,
   no per-symbol explode after round 1.
3. `bpe_train_merges` outputs the learned merges (rendered back to
   plain text) with their selection-time weighted counts, plus the
   post-merge top-BPE_TOPK pair statistics — rendered via sentinel
   expansion in reverse merge order (chr(3) → chr(2) → chr(1): a later
   merge's expansion may contain earlier sentinels, never later ones).
   `bpe_encode_stats` APPLIES the learned merges: per source, symbols
   per word before/after and the compression ratio — the fertility
   report a tokenizer team actually reads.

Determinism: pair counts are exact integer sums; selection ties break
on the raw pair under binary collation (both engines compare UTF-8
bytewise); ``replace`` is leftmost non-overlapping in both engines;
the compression ratio is ONE IEEE division of exact integers (no
round(): Spark and DuckDB disagree on half-way rounding). The DuckDB
oracles restate the identical construction round for round, so merge
selection AND application are under the value-hash gate.

Scale shape (100 TB): one corpus-scale explode+agg builds the word
table (map-side combinable; word-type cardinality ≪ corpus tokens);
each round is a vocabulary-scale agg + a 1-row TakeOrdered + a
broadcast scalar join. The encode report joins per-(source, word)
counts (corpus-scale agg, map-side combinable) to the vocabulary-scale
merged forms. Driver never sees data — the selected pair stays a
broadcast DataFrame, not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

BPE_ROUNDS = 3
BPE_TOPK = 10


# Codepoints the trainers reserve as merge sentinels: chr(1..8) in the
# unbatched loop, U+E000..U+E07F (BPE_SENT_BASE + round*batch slots) in
# the batched one. ASCII \w+ can't match either range today, but the
# reliance is a data contract, not a structural guarantee (switching
# WORD_RE to unicode classes would silently corrupt merge counts) — so
# the precondition is CHECKED once here, at vocabulary scale, for every
# trainer that consumes word frequencies.
_BPE_RESERVED_RE = "[\x01-\x08\uE000-\uE07F]"


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, f) word types with the reserved-sentinel precondition CHECKED.

    The guard is attached to BOTH output columns (r12 ADVICE): a
    column-attached check on ``w`` alone would be pruned away by
    Catalyst for a consumer that only reads ``f`` — guarding each
    column means whichever column survives pruning still carries the
    check (a consumer reading NEITHER column consumes no values the
    sentinels could corrupt). Vocabulary-scale, so the doubled rlike is
    noise; no eager job at plan-construction time."""
    docs = load_table(spark, sf_dir, "documents")

    def _guarded(out_col, out_type):
        return F.when(
            F.col("w").rlike(_BPE_RESERVED_RE),
            F.raise_error(
                F.concat(
                    F.lit(
                        "BPE: corpus word contains a codepoint reserved as a "
                        "merge sentinel (chr(1..8) / U+E000..U+E07F): "
                    ),
                    F.col("w"),
                )
            )
            .cast("string")
            .cast(out_type),
        ).otherwise(out_col)

    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(
            _guarded(F.col("w"), "string").alias("w"),
            _guarded(F.col("f"), "long").alias("f"),
        )
    )


def _pair_stats(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over (w, f) word types. Words
    shorter than 2 symbols contribute nothing (the explicit filter
    matters: Spark's sequence(1, 0) is a DESCENDING sequence, not
    empty)."""
    return (
        words.where(F.char_length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, char_length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "f",
        )
        .groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
    )


def _learn_merges(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """The shared training loop: returns (words, merge_rows) where
    ``words`` is (worig, w, f) after all BPE_ROUNDS merges (worig = the
    original word, the encode op's join key) and ``merge_rows`` is one
    eagerly-checkpointed 1-row frame per round carrying (m{r}, c{r})."""
    words = (
        _word_freqs(spark, sf_dir)
        .select(F.col("w").alias("worig"), "w", "f")
        .localCheckpoint(eager=True)
    )
    merge_rows: list[DataFrame] = []
    for r in range(1, BPE_ROUNDS + 1):
        # eager checkpoint (round-10 review): the 1-row best pair is
        # consumed by this round's merge, the merge-row output, the
        # render scalars AND final_topk — without it each union branch
        # of the final plan re-runs the vocabulary-scale TakeOrdered
        best = (
            _pair_stats(words)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .select(F.col("pair").alias(f"m{r}"), F.col("cnt").alias(f"c{r}"))
            .localCheckpoint(eager=True)
        )
        if not best.take(1):
            # fewer learnable merges than BPE_ROUNDS: an empty best
            # frame would crossJoin-ANNIHILATE the word table and the
            # already-learned merges (silently empty output while the
            # SQL oracle yields NULL-pair rows) — fail loudly instead
            raise ValueError(
                f"corpus exhausted adjacent pairs after {r - 1} of "
                f"{BPE_ROUNDS} BPE merge rounds"
            )
        merge_rows.append(best)
        # checkpoint per round: keeps every later round's plan flat and
        # the vocabulary-scale frame from re-running prior rounds once
        # per downstream consumer (merge row + final stats + render)
        words = (
            words.crossJoin(F.broadcast(best))
            .select("worig", F.expr(f"replace(w, m{r}, char({r}))").alias("w"), "f")
            .localCheckpoint(eager=True)
        )
    return words, merge_rows


def _render_sql(inner: str) -> str:
    """Nested-replace render expression: expand sentinels in reverse
    merge order — a later merge's raw pair may contain EARLIER
    sentinels, never later ones."""
    out = inner
    for r in range(BPE_ROUNDS, 0, -1):
        out = f"replace({out}, char({r}), m{r})"
    return out


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE_ROUNDS learned merges + post-merge top-BPE_TOPK pair stats.

    Columns: stage ('merge' | 'final_topk'), rnk (merge round /
    top-k rank), pair (RENDERED plain text), cnt (weighted count at
    selection/report time).
    """
    words, merge_rows = _learn_merges(spark, sf_dir)

    # one row carrying all merge scalars for rendering (broadcast only
    # where it is actually a join side — a hint on a select-only frame
    # is ignored with a HintErrorLogger warning)
    merges = merge_rows[0]
    for b in merge_rows[1:]:
        merges = merges.crossJoin(b)

    mrows = None
    for r in range(1, BPE_ROUNDS + 1):
        row = merges.select(
            F.lit("merge").alias("stage"),
            F.lit(r).cast("long").alias("rnk"),
            F.expr(_render_sql(f"m{r}")).alias("pair"),
            F.col(f"c{r}").cast("long").alias("cnt"),
        )
        mrows = row if mrows is None else mrows.unionByName(row)

    # TakeOrderedAndProject FIRST (per-partition heaps, never a global
    # sort), then the rank window runs over ≤ BPE_TOPK rows
    wtop = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    final = (
        _pair_stats(words)
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(BPE_TOPK)
        .withColumn("rnk", F.row_number().over(wtop))
        .crossJoin(F.broadcast(merges))
        .select(
            F.lit("final_topk").alias("stage"),
            F.col("rnk").cast("long").alias("rnk"),
            F.expr(_render_sql("pair")).alias("pair"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )
    return mrows.unionByName(final)


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges to the corpus: per ``source``, word
    occurrences, total symbols before (characters — every pre-merge
    symbol is one char) and after the BPE_ROUNDS merges, and the
    compression ratio (symbols_after / symbols_before, one IEEE
    division of exact integers). The fertility/compression report that
    decides whether a merge budget is worth shipping.

    Plan shape: per-(source, word) occurrence counts are one
    corpus-scale map-side-combinable agg; the merged forms live at
    vocabulary scale keyed by the ORIGINAL word, so the join + final
    per-source agg never touch corpus-scale rows again.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_sw = (
        docs.select(
            "source",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
            ).alias("worig"),
        )
        .groupBy("source", "worig")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab, _ = _learn_merges(spark, sf_dir)
    enc = per_sw.join(vocab.select("worig", "w"), "worig")
    return (
        enc.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.char_length("worig")).cast("long").alias(
                "symbols_before"
            ),
            F.sum(F.col("cnt") * F.char_length("w")).cast("long").alias(
                "symbols_after"
            ),
        )
        .select(
            "source",
            "n_words",
            "symbols_before",
            "symbols_after",
            (
                F.col("symbols_after").cast("double")
                / F.col("symbols_before").cast("double")
            ).alias("compression"),
        )
        .orderBy("source")
    )


def _merge_cte_parts() -> list[str]:
    """The shared oracle CTE chain: w0 (word freqs, carrying worig) →
    p{r}/b{r}/w{r} per merge round — restates _learn_merges exactly."""
    parts = [
        f"""w0 as (
  select w as worig, w, cast(count(*) as bigint) as f from (
    select unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as w
    from documents
  ) group by w
)"""
    ]
    for r in range(1, BPE_ROUNDS + 1):
        parts.append(
            f"""p{r} as (
  select pair, sum(f) as cnt from (
    select unnest(list_transform(range(1, length(w)),
                                 i -> substr(w, i, 2))) as pair, f
    from w{r - 1}
  ) group by pair
)"""
        )
        parts.append(
            f"b{r} as (select pair, cnt from p{r} order by cnt desc, pair asc limit 1)"
        )
        parts.append(
            f"""w{r} as (
  select worig, replace(w, (select pair from b{r}), chr({r})) as w, f
  from w{r - 1}
)"""
        )
    return parts


def oracle_bpe_train_merges() -> str:
    parts = _merge_cte_parts()

    def render_sql(inner: str) -> str:
        out = inner
        for r in range(BPE_ROUNDS, 0, -1):
            out = f"replace({out}, chr({r}), (select pair from b{r}))"
        return out

    merge_selects = [
        f"select 'merge' as stage, cast({r} as bigint) as rnk, "
        f"{render_sql(f'(select pair from b{r})')} as pair, "
        f"cast((select cnt from b{r}) as bigint) as cnt"
        for r in range(1, BPE_ROUNDS + 1)
    ]
    parts.append(
        f"""fin as (
  select pair, cnt,
         row_number() over (order by cnt desc, pair asc) as rnk
  from (
    select pair, sum(f) as cnt from (
      select unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, i, 2))) as pair, f
      from w{BPE_ROUNDS}
    ) group by pair
  )
)"""
    )
    final_select = (
        f"select 'final_topk' as stage, cast(rnk as bigint) as rnk, "
        f"{render_sql('pair')} as pair, cast(cnt as bigint) as cnt "
        f"from fin where rnk <= {BPE_TOPK}"
    )
    return (
        "with "
        + ",\n".join(parts)
        + "\n"
        + "\nunion all\n".join(merge_selects + [final_select])
    )


def oracle_bpe_encode_stats() -> str:
    parts = _merge_cte_parts()
    parts.append(
        f"""sw as (
  select source, worig, cast(count(*) as bigint) as cnt from (
    select source,
           unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as worig
    from documents
  ) group by 1, 2
)"""
    )
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select sw.source,
  cast(sum(sw.cnt) as bigint) as n_words,
  cast(sum(sw.cnt * length(v.worig)) as bigint) as symbols_before,
  cast(sum(sw.cnt * length(v.w)) as bigint) as symbols_after,
  cast(sum(sw.cnt * length(v.w)) as double)
    / cast(sum(sw.cnt * length(v.worig)) as double) as compression
from sw join w{BPE_ROUNDS} v using (worig)
group by sw.source
order by sw.source
"""
    )


# ----------------------------------------------- batched BPE training

# Round 11 (VERDICT r10 #3): the 1-merge-per-round trainer above is the
# gate for merge SELECTION semantics, but a real tokenizer needs 32k
# merges and one driver round per merge cannot scale. Standard batched
# BPE (frequency-threshold batching): per round, take the top
# BPE_BATCH candidate pairs and GREEDILY keep each candidate iff it
# does not chain-overlap any already-kept pair in this round
# (kept p, candidate c overlap iff c[0]==p[1] or c[1]==p[0] — the only
# two ways 2-char windows can share a string position). Kept pairs are
# mutually non-interacting, so applying them sequentially within the
# round preserves every pair's selection-time count, and rounds grow
# ~10 merges each: 8 driver rounds learn 80 merges on the sf0.001
# corpus (measured) vs 3 before.
#
# Sentinels: merge (round r, slot j) rewrites to the FIXED codepoint
# BPE_SENT_BASE + (r-1)*BPE_BATCH + (j-1) in the Private Use Area —
# WORD_RE is ASCII \w+ in BOTH regex dialects, so corpus symbols are
# [0-9_a-z] and PUA sentinels can never collide. (Spark's char() wraps
# at 256, so sentinels are injected as Python/chr() literals, never
# via SQL char().) Unfilled slots stay NULL and their replace runs
# against chr(0) — a no-op, which also makes corpus exhaustion a
# graceful no-op round instead of the unbatched trainer's ValueError.

BPE_BATCH_ROUNDS = 8
BPE_BATCH = 16
BPE_SENT_BASE = 0xE000


def _batched_conflict(a, b) -> "F.Column":
    """Chain-overlap predicate between two pair columns (symmetric:
    the two clauses cover both orderings)."""
    return (
        F.substring(a, 1, 1).eqNullSafe(F.substring(b, 2, 1))
    ) | (F.substring(a, 2, 1).eqNullSafe(F.substring(b, 1, 1)))


def _learn_merges_batched(spark: SparkSession, sf_dir: str):
    """Returns (words, kept_frames, merges_row) where ``words`` is
    (worig, w, f) after all rounds, ``kept_frames[r-1]`` holds round
    r's kept merges (slot, pair, cnt — pair still sentinel-encoded)
    and ``merges_row`` is ONE row with every m{r}x{j}/c{r}x{j} scalar
    for rendering.

    Round 14: the per-round candidate set is BPE_BATCH (=16) rows by
    construction — metadata-scale, like a k-means centroid set — so
    each round COLLECTS the TakeOrdered top-16 and runs the greedy
    chain-overlap selection in plain Python (an exact twin of the old
    in-plan F.aggregate fold: same (count desc, pair asc) scan order,
    same first/last-char conflict test on the 2-symbol pairs — pinned
    by tests/test_ops.py::test_bpe_batched_greedy_twin_matches_plan).
    kept/merge scalars become LocalRelations, the per-round sentinel
    replaces become literals, and each round costs ONE Spark job (the
    vocabulary-scale pair TakeOrdered, which also materializes the
    previous round's lazily-checkpointed rewrite) instead of three-plus
    (kept-fold checkpoint, 32-agg mrow checkpoint, crossJoin'd rewrite
    checkpoint) — 8 rounds dropped from ~24 fixed-overhead jobs to ~8.
    Selection semantics and every rendered value are unchanged (the
    DuckDB oracle still replays the greedy fold itself)."""
    words = (
        _word_freqs(spark, sf_dir)
        .select(F.col("w").alias("worig"), "w", "f")
        .localCheckpoint(eager=True)
    )
    kept_frames: list[DataFrame] = []
    mvals: dict[str, object] = {}
    for r in range(1, BPE_BATCH_ROUNDS + 1):
        top = (
            _pair_stats(words)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(BPE_BATCH)
            .collect()
        )
        kept_rows: list[tuple[str, int]] = []
        for c in top:
            pair, cnt = c["pair"], c["cnt"]
            # chain-overlap vs every already-kept pair this round: the
            # only two ways 2-char windows can share a string position
            if not any(k[0] == pair[1] or k[1] == pair[0] for k, _ in kept_rows):
                kept_rows.append((pair, cnt))
        kept_frames.append(
            spark.createDataFrame(
                [
                    (j, p, int(c))
                    for j, (p, c) in enumerate(kept_rows, start=1)
                ],
                "slot long, pair string, cnt bigint",
            )
        )
        w = F.col("w")
        for j in range(1, BPE_BATCH + 1):
            sent = BPE_SENT_BASE + (r - 1) * BPE_BATCH + (j - 1)
            pair, cnt = (
                kept_rows[j - 1] if j <= len(kept_rows) else (None, None)
            )
            mvals[f"m{r}x{j}"] = pair
            mvals[f"c{r}x{j}"] = int(cnt) if cnt is not None else None
            # unfilled slots replace chr(0) — a no-op, same as the old
            # coalesce(NULL slot, chr(0)) form
            w = F.replace(
                w,
                F.lit(pair if pair is not None else "\x00"),
                F.lit(chr(sent)),
            )
        # lazy checkpoint: the next round's TakeOrdered collect (or the
        # caller's first action) materializes it once; every later
        # consumer reuses the checkpointed partitions
        words = words.select("worig", w.alias("w"), "f").localCheckpoint(
            eager=False
        )
    schema = ", ".join(
        f"m{r}x{j} string, c{r}x{j} bigint"
        for r in range(1, BPE_BATCH_ROUNDS + 1)
        for j in range(1, BPE_BATCH + 1)
    )
    merges_row = spark.createDataFrame(
        [
            tuple(
                mvals[f"{p}{r}x{j}"]
                for r in range(1, BPE_BATCH_ROUNDS + 1)
                for j in range(1, BPE_BATCH + 1)
                for p in ("m", "c")
            )
        ],
        schema,
    )
    return words, kept_frames, merges_row


def _render_batched(inner) -> "F.Column":
    """Expand sentinels back to text in REVERSE application order (a
    later merge's pair may contain earlier sentinels, never later)."""
    out = inner
    for r in range(BPE_BATCH_ROUNDS, 0, -1):
        for j in range(BPE_BATCH, 0, -1):
            sent = BPE_SENT_BASE + (r - 1) * BPE_BATCH + (j - 1)
            out = F.replace(
                out,
                F.lit(chr(sent)),
                F.coalesce(F.col(f"m{r}x{j}"), F.lit("")),
            )
    return out


def _ranked_kept(kept_frames) -> DataFrame:
    """Union the per-round kept frames into (round, slot, pair, cnt,
    rnk) with the global application order — ONE definition shared by
    the trainer report and the merge-usage report (the round-7
    'one definition ends the copy' rule)."""
    kept_all = None
    for r, kf in enumerate(kept_frames, start=1):
        t = kf.select(F.lit(r).cast("long").alias("round"), "slot", "pair", "cnt")
        kept_all = t if kept_all is None else kept_all.unionByName(t)
    worder = Window.orderBy(F.asc("round"), F.asc("slot"))
    return kept_all.withColumn("rnk", F.row_number().over(worder))


def bpe_train_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BPE training: BPE_BATCH_ROUNDS rounds × up to BPE_BATCH
    greedily-compatible merges each (the scale path past the 1-merge
    trainer), plus the post-merge top-BPE_TOPK pair stats.

    Columns: stage ('merge' | 'final_topk'), rnk (global application
    order / top-k rank), round (merge round; 0 for final_topk), pair
    (RENDERED plain text), cnt (weighted count at selection/report
    time). The DuckDB oracle replays the identical greedy selection as
    an unrolled kept-accumulation CTE chain, so BATCH selection is
    under the value hash, not just application.
    """
    words, kept_frames, merges_row = _learn_merges_batched(spark, sf_dir)
    mrows = (
        _ranked_kept(kept_frames)
        .crossJoin(F.broadcast(merges_row))
        .select(
            F.lit("merge").alias("stage"),
            F.col("rnk").cast("long").alias("rnk"),
            "round",
            _render_batched(F.col("pair")).alias("pair"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )
    wtop = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    final = (
        _pair_stats(words)
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(BPE_TOPK)
        .withColumn("rnk", F.row_number().over(wtop))
        .crossJoin(F.broadcast(merges_row))
        .select(
            F.lit("final_topk").alias("stage"),
            F.col("rnk").cast("long").alias("rnk"),
            F.lit(0).cast("long").alias("round"),
            _render_batched(F.col("pair")).alias("pair"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )
    return mrows.unionByName(final)


def _batched_cte_parts() -> list[str]:
    """The shared batched-trainer oracle CTE chain: bw0 (word freqs,
    carrying worig) → per round r: bp{r} pair counts → bc{r} ranked
    candidates → the materialized ku kept-accumulation chain → bk{r}
    kept slots → bm{r} slot scalars → bw{r} sentinel-applied words.
    Shared by the trainer and the encode report so the two replays
    cannot drift."""
    conflict = (
        "(substr(c.pair,1,1) = substr(p.pair,2,1) "
        "or substr(c.pair,2,1) = substr(p.pair,1,1))"
    )
    parts = [
        f"""bw0 as materialized (
  select w as worig, w, cast(count(*) as bigint) as f from (
    select unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as w
    from documents
  ) group by w
)"""
    ]
    for r in range(1, BPE_BATCH_ROUNDS + 1):
        parts.append(
            f"""bp{r} as materialized (
  select pair, sum(f) as cnt from (
    select unnest(list_transform(range(1, length(w)),
                                 i -> substr(w, i, 2))) as pair, f
    from bw{r - 1}
  ) group by pair
)"""
        )
        parts.append(
            f"""bc{r} as materialized (
  select pair, cnt, row_number() over (order by cnt desc, pair asc) as rn
  from bp{r} order by cnt desc, pair asc limit {BPE_BATCH}
)"""
        )
        # Each ku level is referenced TWICE (the NOT EXISTS probe and
        # the union) — without `materialized` DuckDB inlines the chain
        # into 2^BPE_BATCH subplans and the bind never finishes.
        parts.append(
            f"ku{r}_0 as materialized (select cast(null as varchar) as pair, "
            f"cast(null as bigint) as cnt, 0 as rn where 1 = 0)"
        )
        for i in range(1, BPE_BATCH + 1):
            parts.append(
                f"""k{r}_{i} as (
  select c.pair, c.cnt, c.rn from bc{r} c where c.rn = {i}
    and not exists (select 1 from ku{r}_{i - 1} p where {conflict})
)"""
            )
            parts.append(
                f"ku{r}_{i} as materialized (select * from ku{r}_{i - 1} "
                f"union all select * from k{r}_{i})"
            )
        parts.append(
            f"""bk{r} as materialized (
  select pair, cnt, row_number() over (order by rn asc) as slot
  from ku{r}_{BPE_BATCH}
)"""
        )
        mcols = ", ".join(
            f"max(case when slot = {j} then pair end) as m{j}, "
            f"max(case when slot = {j} then cnt end) as c{j}"
            for j in range(1, BPE_BATCH + 1)
        )
        parts.append(f"bm{r} as materialized (select {mcols} from bk{r})")
        expr = "w"
        for j in range(1, BPE_BATCH + 1):
            sent = BPE_SENT_BASE + (r - 1) * BPE_BATCH + (j - 1)
            expr = (
                f"replace({expr}, coalesce((select m{j} from bm{r}), chr(0)), "
                f"chr({sent}))"
            )
        parts.append(
            f"bw{r} as materialized (select worig, {expr} as w, f from bw{r - 1})"
        )
    return parts


def oracle_bpe_train_merges_batched() -> str:
    """DuckDB replay of the batched trainer: the greedy compatible-set
    selection unrolls as one kept-accumulation CTE pair per candidate
    rank (no recursion — the candidate list is bounded at BPE_BATCH),
    then the same fixed-slot sentinel application."""
    parts = _batched_cte_parts()

    merge_union = "\n    union all\n    ".join(
        f"select {r} as round, slot, pair, cnt from bk{r}"
        for r in range(1, BPE_BATCH_ROUNDS + 1)
    )
    parts.append(
        f"""ball as materialized (
  select round, slot, pair, cnt,
         row_number() over (order by round asc, slot asc) as rnk
  from (
    {merge_union}
  )
)"""
    )
    parts.append(
        f"""bfin as materialized (
  select pair, cnt,
         row_number() over (order by cnt desc, pair asc) as rnk
  from (
    select pair, sum(f) as cnt from (
      select unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, i, 2))) as pair, f
      from bw{BPE_BATCH_ROUNDS}
    ) group by pair
  )
)"""
    )
    # Sentinel expansion, reverse application order. 128 nested
    # replace() calls blow DuckDB's expression-binder recursion limit
    # (max depth 128), so the render runs as one CTE LAYER PER ROUND —
    # each layer nests only BPE_BATCH replaces — over the unified
    # merge+final_topk relation.
    parts.append(
        f"""rr{BPE_BATCH_ROUNDS + 1} as (
  select 'merge' as stage, rnk, round, pair, cnt from ball
  union all
  select 'final_topk' as stage, rnk, 0 as round, pair, cnt
  from bfin where rnk <= {BPE_TOPK}
)"""
    )
    for r in range(BPE_BATCH_ROUNDS, 0, -1):
        expr = "pair"
        for j in range(BPE_BATCH, 0, -1):
            sent = BPE_SENT_BASE + (r - 1) * BPE_BATCH + (j - 1)
            expr = (
                f"replace({expr}, chr({sent}), "
                f"coalesce((select m{j} from bm{r}), ''))"
            )
        parts.append(
            f"rr{r} as (select stage, rnk, round, {expr} as pair, cnt "
            f"from rr{r + 1})"
        )
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select stage, cast(rnk as bigint) as rnk, cast(round as bigint) as round,
       pair, cast(cnt as bigint) as cnt
from rr1
"""
    )


def bpe_encode_stats_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the BATCHED trainer's merges (80 learned on the sf0.001
    corpus vs bpe_encode_stats' 3) to the corpus: per ``source``, word
    occurrences, total symbols before/after and the compression ratio —
    the report that shows the deeper merge budget actually buying
    compression (sentinels are single BMP codepoints, so symbol count =
    char_length in both engines).

    Plan shape identical to bpe_encode_stats: per-(source, word) counts
    are one corpus-scale map-side-combinable agg; merged forms join at
    vocabulary scale keyed by the original word.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_sw = (
        docs.select(
            "source",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
            ).alias("worig"),
        )
        .groupBy("source", "worig")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab, _, _ = _learn_merges_batched(spark, sf_dir)
    enc = per_sw.join(vocab.select("worig", "w"), "worig")
    return (
        enc.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.char_length("worig")).cast("long").alias(
                "symbols_before"
            ),
            F.sum(F.col("cnt") * F.char_length("w")).cast("long").alias(
                "symbols_after"
            ),
        )
        .select(
            "source",
            "n_words",
            "symbols_before",
            "symbols_after",
            (
                F.col("symbols_after").cast("double")
                / F.col("symbols_before").cast("double")
            ).alias("compression"),
        )
        .orderBy("source")
    )


def oracle_bpe_encode_stats_batched() -> str:
    """Shares the batched training CTE chain verbatim, then joins the
    merged vocabulary back to per-(source, word) occurrence counts."""
    parts = _batched_cte_parts()
    parts.append(
        f"""besw as materialized (
  select source, w as worig, cast(count(*) as bigint) as cnt from (
    select source,
        unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as w
    from documents
  ) group by source, w
)"""
    )
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select source,
    cast(sum(cnt) as bigint) as n_words,
    cast(sum(cnt * length(worig)) as bigint) as symbols_before,
    cast(sum(cnt * length(w)) as bigint) as symbols_after,
    cast(sum(cnt * length(w)) as double)
        / cast(sum(cnt * length(worig)) as double) as compression
from (
    select s.source, s.cnt, s.worig, v.w
    from besw s join bw{BPE_BATCH_ROUNDS} v on s.worig = v.worig
)
group by source
order by source
"""
    )


# ------------------------------------------------- merge-usage pruning

BPE_SENT_COUNT = BPE_BATCH_ROUNDS * BPE_BATCH


def bpe_merge_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-merge USAGE report over the batched trainer's vocabulary —
    the pruning step of the tokenizer lifecycle (train → encode →
    prune): for every learned merge, how many corpus tokens its symbol
    survives as in the FINAL segmentation, across how many word types,
    and whether it is prunable (zero surviving uses: the merge's output
    was wholly consumed by later merges, a dead vocab entry that wastes
    an embedding row in the trained model).

    Counting runs on the sentinel-encoded vocabulary: merge (r, j)'s
    applications survive as occurrences of its single-codepoint
    sentinel, so usage = Σ_word f · occ(sentinel, w_final) — exact
    bigint, order-free. occ is char_length(w) − char_length(replace(w,
    sent, '')) (sentinels are 1 char by construction).

    Scale shape (100 TB): the corpus was already reduced to the
    word-frequency vocabulary by the shared training loop (the ONE
    corpus-scale pass); this report is a vocabulary × 128-merge
    broadcast cross join — vocabulary-scale work, no new corpus pass,
    no shuffle beyond one (≤128-group) aggregate. usage_share is ONE
    IEEE division of exact integers.
    """
    words, kept_frames, merges_row = _learn_merges_batched(spark, sf_dir)
    kept_all = _ranked_kept(kept_frames)
    sent_lut = F.array(
        *[F.lit(chr(BPE_SENT_BASE + i)) for i in range(BPE_SENT_COUNT)]
    )
    tagged = kept_all.withColumn(
        "sent",
        F.element_at(
            sent_lut,
            ((F.col("round") - 1) * BPE_BATCH + F.col("slot")).cast("int"),
        ),
    )
    occ = F.char_length("w") - F.char_length(F.replace(F.col("w"), F.col("sent")))
    usage = (
        words.crossJoin(F.broadcast(tagged))
        .select(
            "rnk", "round", "slot", "pair", "cnt",
            (F.col("f") * occ).alias("wocc"),
            F.when(occ > 0, 1).otherwise(0).alias("touched"),
        )
        .groupBy("rnk", "round", "slot", "pair", "cnt")
        .agg(
            F.sum("wocc").alias("used_tokens"),
            F.sum("touched").alias("word_types"),
        )
    )
    totals = words.agg(
        F.sum(F.col("f") * F.char_length("w")).alias("total_symbols")
    )
    return (
        usage.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(merges_row))
        .select(
            F.col("rnk").cast("long").alias("rnk"),
            "round",
            F.col("slot").cast("long").alias("slot"),
            _render_batched(F.col("pair")).alias("pair"),
            F.col("cnt").cast("long").alias("trained_cnt"),
            F.col("used_tokens").cast("long").alias("used_tokens"),
            F.col("word_types").cast("long").alias("word_types"),
            (
                F.col("used_tokens").cast("double")
                / F.col("total_symbols").cast("double")
            ).alias("usage_share"),
            F.when(F.col("used_tokens") == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("prunable"),
        )
    )


def oracle_bpe_merge_usage() -> str:
    """Shares the batched training CTE chain verbatim, then counts each
    merge's surviving sentinel occurrences over the final vocabulary."""
    parts = _batched_cte_parts()
    merge_union = "\n    union all\n    ".join(
        f"select {r} as round, slot, pair, cnt from bk{r}"
        for r in range(1, BPE_BATCH_ROUNDS + 1)
    )
    parts.append(
        f"""ball as materialized (
  select round, slot, pair, cnt,
         row_number() over (order by round asc, slot asc) as rnk
  from (
    {merge_union}
  )
)"""
    )
    parts.append(
        f"""btot as (
  select sum(f * length(w)) as total_symbols from bw{BPE_BATCH_ROUNDS}
)"""
    )
    parts.append(
        f"""busage as (
  select m.rnk, m.round, m.slot, m.pair, m.cnt,
      sum(v.f * (length(v.w) - length(replace(v.w,
          chr(cast({BPE_SENT_BASE} + (m.round - 1) * {BPE_BATCH} + m.slot - 1 as integer)),
          '')))) as used_tokens,
      sum(case when length(v.w) > length(replace(v.w,
          chr(cast({BPE_SENT_BASE} + (m.round - 1) * {BPE_BATCH} + m.slot - 1 as integer)),
          '')) then 1 else 0 end) as word_types
  from ball m cross join bw{BPE_BATCH_ROUNDS} v
  group by 1, 2, 3, 4, 5
)"""
    )
    parts.append(
        f"""uu{BPE_BATCH_ROUNDS + 1} as (
  select rnk, round, slot, pair, cnt, used_tokens, word_types from busage
)"""
    )
    for r in range(BPE_BATCH_ROUNDS, 0, -1):
        expr = "pair"
        for j in range(BPE_BATCH, 0, -1):
            sent = BPE_SENT_BASE + (r - 1) * BPE_BATCH + (j - 1)
            expr = (
                f"replace({expr}, chr({sent}), "
                f"coalesce((select m{j} from bm{r}), ''))"
            )
        parts.append(
            f"uu{r} as (select rnk, round, slot, {expr} as pair, cnt, "
            f"used_tokens, word_types from uu{r + 1})"
        )
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select cast(rnk as bigint) as rnk, cast(round as bigint) as round,
    cast(slot as bigint) as slot, pair,
    cast(cnt as bigint) as trained_cnt,
    cast(used_tokens as bigint) as used_tokens,
    cast(word_types as bigint) as word_types,
    cast(used_tokens as double) / cast(total_symbols as double)
        as usage_share,
    cast(case when used_tokens = 0 then 1 else 0 end as bigint) as prunable
from uu1 cross join btot
"""
    )
