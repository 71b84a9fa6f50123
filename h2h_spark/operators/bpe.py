"""Distributed BPE vocabulary training (engine extension — the tokenizer
side of an LLM data pipeline).

Byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016 — public) learns a
subword vocabulary by repeatedly merging the most frequent adjacent
symbol pair.  The classic implementation is a single-machine dict loop;
the corpus-scale shape implemented here is the same driver-loop-over-
bounded-aggregates pattern as :mod:`operators.cluster`'s k-means:

* trainer state is the **word-frequency table** (top ``max_words`` by
  frequency — BPE statistics saturate quickly, and the cap bounds every
  round at |vocab| rows regardless of corpus size; one corpus pass total);
* each merge round is ONE distributed aggregate (adjacent-pair counts
  weighted by word frequency) + a 1-row argmax collect (count desc, pair
  asc — deterministic ties) + a vectorized merge application;
* merge application is a **left fold** over each word's symbol array
  (``aggregate(slice(toks, 2, …), toks[1], …)``): when the accumulator
  ends with symbol ``a`` and the next token is ``b`` they fuse — exactly
  greedy leftmost BPE, and exactly reproducible as DuckDB's
  ``list_reduce`` in the oracle twin.  A regexp/replace formulation is
  NOT used: string replace consumes the shared separator and silently
  skips alternate occurrences of overlapping pairs (``a a a a`` must
  give ``aa aa``, not ``aa a a``) — the fold has no such failure mode.

Symbols are characters of lowercased alphanumeric tokens (no end-of-word
marker — documented deviation from Sennrich's ``</w>``, irrelevant to
the merge mechanics).  All symbol text stays ``[a-z0-9]+`` so literal
interpolation into fold expressions is injection-safe by construction.

At 100 TB: the corpus is touched once (word counts); every round after
that works on the |vocab|-bounded table — the same reason production BPE
trainers (GPT-2's, SentencePiece) count words first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def _merge_fold_expr(a: str, b: str) -> str:
    """Greedy-leftmost application of merge (a, b) as a SQL left fold
    over the word's space-separated symbol string."""
    return f"""aggregate(
        slice(split(sym, ' '), 2, greatest(size(split(sym, ' ')) - 1, 0)),
        element_at(split(sym, ' '), 1),
        (acc, x) -> CASE
            WHEN (acc = '{a}' OR endswith(acc, ' {a}')) AND x = '{b}'
            THEN concat(substring(acc, 1, length(acc) - {len(a)}), '{a}{b}')
            ELSE concat(acc, ' ', x) END)"""


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    merges: int = 6,
    max_words: int = 2000,
) -> DataFrame:
    """Learn ``merges`` BPE merge rules from the corpus; returns the
    rule table ``(step, sym_a, sym_b, pair_count)`` — the artifact a
    tokenizer ships.  Deterministic: ties broken by (count desc, a, b);
    the word table is the top ``max_words`` by (freq desc, word)."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "w")
        .limit(max_words)
    )
    # localCheckpoint (not persist): each round's fold expression would
    # otherwise STACK in the logical plan — by ~50 rounds the chained
    # expression tree OOMs the JVM during analysis even though the data
    # is |vocab| rows.  Checkpointing truncates lineage so every round's
    # plan is one fold over a materialized table.
    wt = words.select(
        "w",
        "freq",
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
    ).localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, int]] = []
    for step in range(1, merges + 1):
        toks = F.split("sym", " ")
        pairs = (
            wt.select("freq", toks.alias("t"))
            .select(
                "freq",
                F.explode(
                    F.transform(
                        # sequence(1, 0) counts DOWN in Spark — guard 1-char words
                        F.when(
                            F.size("t") > 1,
                            F.sequence(F.lit(1), F.size("t") - 1),
                        ).otherwise(F.expr("array()")),
                        lambda i: F.struct(
                            F.element_at(F.col("t"), i).alias("a"),
                            F.element_at(F.col("t"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .select("freq", "p.a", "p.b")
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        rules.append((step, a, b, cnt))
        wt = wt.select(
            "w", "freq", F.expr(_merge_fold_expr(a, b)).alias("sym")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rules, "step int, sym_a string, sym_b string, pair_count bigint"
    )


def _select_disjoint(
    ranked: list[tuple[str, str, int]],
    batch: int | None,
    count_floor: int = 1,
):
    """Greedy conflict-free prefix of a (cnt desc, a, b)-ranked pair
    list: accept a pair iff none of {a, b, a||b} was used by a
    higher-ranked accepted pair.  Symbol-disjointness (including the
    merge PRODUCT, which could collide with another pair's member) is
    what makes simultaneous application order-independent.
    ``batch=None`` = adaptive: accept EVERY disjoint candidate with
    count >= ``count_floor`` (the ranked list's length is the only cap),
    so merges-per-round tracks how many independent high-frequency pairs
    the corpus actually has instead of a fixed constant."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for a, b, cnt in ranked:
        if batch is not None and len(out) >= batch:
            break
        if cnt < count_floor:
            break  # ranked desc: everything below is under the floor too
        if {a, b, a + b} & used:
            continue
        used |= {a, b, a + b}
        out.append((a, b, cnt))
    return out


def _multi_merge_fold_expr(accepted: list[tuple[str, str]]) -> str:
    """One-pass greedy-leftmost fold applying ALL accepted (symbol-
    disjoint) merges simultaneously; since the pairs share no symbols
    (nor products), this equals any sequential application order."""
    lits = ", ".join(
        f"named_struct('a', '{a}', 'b', '{b}')" for a, b in accepted
    )
    # at most one pair can match a given x (b-symbols are pairwise
    # distinct by disjointness), so element_at(filter(...), 1) is total
    match = (
        f"filter(array({lits}), p -> p.b = x AND "
        f"(acc = p.a OR endswith(acc, concat(' ', p.a))))"
    )
    return f"""aggregate(
        slice(split(sym, ' '), 2, greatest(size(split(sym, ' ')) - 1, 0)),
        element_at(split(sym, ' '), 1),
        (acc, x) -> CASE
            WHEN size({match}) > 0
            THEN concat(
                substring(acc, 1, length(acc) - length(element_at({match}, 1).a)),
                element_at({match}, 1).a, x)
            ELSE concat(acc, ' ', x) END)"""


def bpe_train_batched(
    df: DataFrame,
    text_col: str,
    *,
    rounds: int = 2,
    batch: int | None = 64,
    max_words: int = 2000,
    candidates: int | None = None,
    count_floor: int = 1,
) -> DataFrame:
    """BPE training with ``batch`` merges per distributed round instead
    of one — the fix for :func:`bpe_train`'s one-job-per-merge loop (at
    a production 50k vocab that is 50k driver round-trips; this cuts
    rounds ~batch×).  Per round: ONE pair-count aggregate, a bounded
    ``candidates``-row collect, driver-side greedy selection of the
    top-``batch`` SYMBOL-DISJOINT pairs (standard trick: a pair sharing
    a symbol — or its merge product — with a higher-count accepted pair
    waits for the next round, keeping simultaneous application
    order-independent), then one fold pass applies them all.  Returns
    ``(round, rank, sym_a, sym_b, pair_count)``.

    Production sizing (measured curve in SCALE.md): ``batch=None`` is
    the adaptive mode — accept every disjoint candidate with count >=
    ``count_floor`` per round, so a 50k vocab lands in hundreds of
    rounds, not 50k.  ``candidates`` defaults to ``4*batch`` (512 when
    adaptive): disjointness consumes ~2-3 candidates per accepted merge
    on natural text, so 4x keeps the accept rate near the cap without
    collecting an unbounded list."""
    spark = df.sparkSession
    if candidates is None:
        candidates = 512 if batch is None else max(4 * batch, 64)
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "w")
        .limit(max_words)
    )
    # localCheckpoint per round for the same lineage-truncation reason
    # as bpe_train — see the comment there.
    wt = words.select(
        "w",
        "freq",
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
    ).localCheckpoint(eager=True)
    rules: list[tuple[int, int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        toks = F.split("sym", " ")
        pairs = (
            wt.select("freq", toks.alias("t"))
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.when(
                            F.size("t") > 1,
                            F.sequence(F.lit(1), F.size("t") - 1),
                        ).otherwise(F.expr("array()")),
                        lambda i: F.struct(
                            F.element_at(F.col("t"), i).alias("a"),
                            F.element_at(F.col("t"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .select("freq", "p.a", "p.b")
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )
        ranked = [
            (r["a"], r["b"], int(r["cnt"]))
            for r in pairs.orderBy(F.col("cnt").desc(), "a", "b")
            .limit(candidates)
            .collect()
        ]
        accepted = _select_disjoint(ranked, batch, count_floor)
        if not accepted:
            break
        for i, (a, b, cnt) in enumerate(accepted, start=1):
            rules.append((rnd, i, a, b, cnt))
        wt = wt.select(
            "w", "freq",
            F.expr(
                _multi_merge_fold_expr([(a, b) for a, b, _ in accepted])
            ).alias("sym"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rules,
        "round int, rank int, sym_a string, sym_b string, pair_count bigint",
    )


def bpe_apply(df: DataFrame, text_col: str, rules: list[tuple[str, str]]) -> DataFrame:
    """Tokenize: apply a learned merge list (in order) to every word of
    ``text_col``; adds ``n_subwords`` — the post-merge token count (the
    number an LLM pipeline budgets by).  Vectorized: one fold expression
    per rule, chained; no Python in the hot path.

    The fold chain runs once per DISTINCT word of the row, not per word
    occurrence (natural text is Zipfian, so occurrences dwarf distinct
    words); per-occurrence counts come from a row-local word→length map
    lookup.  The map is **let-bound** (evaluated once per row via a
    single-element ``transform`` lambda): referenced directly inside the
    per-occurrence ``aggregate`` lambda, Catalyst re-inlines — and
    re-evaluates — the whole fold chain per occurrence, which measured
    16× SLOWER than the per-occurrence fold it was meant to replace.

    Round 14: the input is scale_out-rescaled first (keyed by the text
    hash) — the fold chain is heavy per-row compute and a small corpus
    arrives as one scan split; no-op at >= cores input partitions."""
    from h2h_spark.operators import scale_out

    df = scale_out(df, text_col)
    out = df.withColumn(
        "__words", tokens(text_col)
    ).withColumn(
        "__dw", F.array_distinct(F.col("__words"))
    ).withColumn(
        "__syms",
        F.transform(
            F.col("__dw"),
            lambda w: F.trim(F.regexp_replace(w, "(.)", "$1 ")),
        ),
    )
    for a, b in rules:
        fold = _merge_fold_expr(a, b).replace("split(sym, ' ')", "split(x, ' ')")
        out = out.withColumn(
            "__syms", F.expr(f"transform(__syms, x -> {fold})")
        )
    n_sub = F.expr(
        "element_at(transform(array("
        "map_from_arrays(__dw, transform(__syms, s -> size(split(s, ' '))))"
        "), m -> aggregate(__words, 0, (acc, w) -> acc + element_at(m, w))), 1)"
    )
    return out.withColumn("n_subwords", n_sub.cast("bigint")).drop(
        "__words", "__dw", "__syms"
    )


def bpe_apply_ranked(
    df: DataFrame, text_col: str, rules: list[tuple[str, str]]
) -> DataFrame:
    """Production-shape tokenizer APPLY: broadcast the merge-rank table
    and run the classic lowest-rank-pair loop per word (the GPT-2 /
    HF-tokenizers algorithm) inside Arrow-batched ``mapInPandas``, with
    a per-batch word cache — natural text repeats words heavily, so the
    cache collapses per-word cost to once per distinct word per batch.

    Equivalent to :func:`bpe_apply`'s chained fold expressions (merging
    rule j can only create symbols that appear in LATER-ranked rules,
    so rank order == sequential order; proven differentially in tests),
    but cost is O(distinct words × merge passes) instead of O(tokens ×
    rules) chained JVM expressions — the path that scales to 50k-rule
    vocabularies where a 50k-deep expression chain cannot plan.
    Emits ``n_subwords`` per row like :func:`bpe_apply`."""
    import pandas as pd

    from .dedup import tokens

    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(rules)}
    b_ranks = spark.sparkContext.broadcast(ranks)

    def _count_word(word: str, rk: dict, cache: dict) -> int:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) > 1:
            best, best_r = None, None
            for pair in zip(syms, syms[1:]):
                r = rk.get(pair)
                if r is not None and (best_r is None or r < best_r):
                    best, best_r = pair, r
            if best is None:
                break
            a, b = best
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = len(syms)
        return len(syms)

    # round 14: rescale before the per-row Python merge loop (same
    # single-scan-split starvation rescue as bpe_apply; no-op at scale)
    from h2h_spark.operators import scale_out

    tokenized = scale_out(df, text_col).withColumn("__words", tokens(text_col))

    def _run(batches):
        rk = b_ranks.value
        cache: dict = {}
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_subwords"] = pd.Series(
                [
                    # null text -> null count, matching bpe_apply's fold
                    None if words is None
                    else sum(_count_word(w, rk, cache) for w in words)
                    for words in pdf["__words"]
                ],
                dtype="Int64",
                index=pdf.index,
            )
            yield pdf.drop(columns=["__words"])

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in tokenized.schema.fields
        if f.name != "__words"
    ) + ", n_subwords long"
    return tokenized.mapInPandas(_run, out_schema)
