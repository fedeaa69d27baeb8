"""Corpus-level text statistics (SURVEY.md §2.11 extensions) — the
term-weighting / n-gram operators a training-data pipeline runs over the
whole corpus, as distributed aggregation plans.

Scale shape: every stage shuffles ids + short tokens, never documents.
TF is a (doc_id, token) hash agg; document frequency is a token-keyed
hash agg over TF's (already-distinct) output; the corpus size joins in
as a broadcast 1-row aggregate — no ``collect()`` anywhere. The final
per-doc top-k is one window on doc_id. At 100 TB the token dictionary is
the only conceptually-global state and it stays distributed (token-keyed
join); nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize


def tfidf_topk(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf(d,t) · ln(N / df(t)), ties
    broken by token ascending so the result set is deterministic.

    Returns (id_col, token, tfidf, rn) with rn ∈ [1, k].
    """
    tf = (
        docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "__tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("dfc"))
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            id_col,
            "token",
            F.round("__tfidf", 6).alias("tfidf"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


def bigram_topn(docs: DataFrame, text_col: str, n: int = 20) -> DataFrame:
    """Top-n word bigrams by corpus frequency (tie-break: bigram asc).

    Bigrams are built INSIDE the row with zip_with over two aligned
    slices — the explode ships (bigram) strings only, and the count is a
    plain partial+final hash agg. No joins, no per-row Python.
    """
    toks = tokenize(text_col)
    sz = F.size(toks)
    bigrams = F.when(
        sz >= 2,
        F.zip_with(
            F.slice(toks, 1, sz - 1),
            F.slice(toks, 2, sz - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(n)
    )


def dup_ngram_fraction(
    docs: DataFrame, id_col: str, text_col: str, n: int = 2,
) -> DataFrame:
    """Gopher-style within-document repetition signal: the fraction of a
    document's word n-grams that are duplicates (1 − distinct/total).
    High values flag template/boilerplate spam a quality gate drops.
    Complements ``repetition_ratio`` (token-level) with phrase-level
    evidence. Returns (id, n_ngrams, dup_ngram_frac).

    Plan: built ENTIRELY in-row — n-grams via transform over a position
    sequence with array slices, the fraction via array_distinct — one
    codegen'd projection, no explode, no shuffle at all.
    """
    toks = F.split(F.col(text_col), " ")
    sz = F.size(toks)
    ngs = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cnt = F.size(ngs)
    frac = F.when(
        cnt > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(ngs)) / cnt, 6
        ),
    ).otherwise(F.lit(0.0))
    return docs.select(
        id_col,
        cnt.cast("long").alias("n_ngrams"),
        frac.alias("dup_ngram_frac"),
    )


def vocab_prune(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    df_frac: float = 0.8,
) -> DataFrame:
    """C4-style boilerplate-token pruning: drop every token whose
    DOCUMENT frequency exceeds ``df_frac`` of the corpus (ubiquitous
    tokens carry no training signal), preserving the order of the
    surviving tokens. Returns (id, pruned_text, n_removed).

    Plan: one distinct-token explode + hash agg finds the hot set; by
    construction it is tiny (tokens present in > df_frac of ALL
    documents — bounded by 1/df_frac times the per-doc vocabulary, not
    by corpus size), so it collects to the driver and inlines into a
    per-row array filter: the second pass is a pure in-row expression
    with NO shuffle and no join. At a df_frac low enough to make the
    hot set large, switch to the posexplode + broadcast-anti-join +
    re-assemble form instead of lifting the list into the plan.
    """
    toks = F.split(F.col(text_col), " ")
    n_docs = docs.count()
    hot_rows = (
        docs.select(F.explode(F.array_distinct(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("dc"))
        .filter(F.col("dc") > df_frac * n_docs)
        .collect()
    )
    hot = sorted(r["tok"] for r in hot_rows)
    if not hot:
        return docs.select(
            id_col,
            F.col(text_col).alias("pruned_text"),
            F.lit(0).cast("long").alias("n_removed"),
        )
    hot_arr = F.array(*[F.lit(t) for t in hot])
    kept = F.filter(toks, lambda t: ~F.array_contains(hot_arr, t))
    return docs.select(
        id_col,
        F.array_join(kept, " ").alias("pruned_text"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )


#: Stopword list for the Gopher-style signal gates — deterministic and
#: oracle-expressible (mirrors functions.text.LANG_MARKERS discipline).
SIGNAL_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "to", "and", "in")


def quality_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    min_stopword_frac: float = 0.01,
) -> DataFrame:
    """Gopher-style per-document quality signals + keep gate (Rae et
    al. 2021, "Scaling Language Models" §A1.1 heuristics, re-expressed
    as pure in-row array expressions): word count, mean word length,
    stopword fraction, unique-word fraction, and the conjunctive
    ``keep`` flag over the configured gates.

    Scale: NO explode, NO shuffle — every signal is a higher-order
    function over the token array inside whole-stage codegen, so this
    runs at scan speed and composes in front of the expensive dedup
    stages (gate first, shuffle later — the corpus_pipeline ordering).
    Fractions round to 6 dp; the keep gate compares the ROUNDED values
    so engine and oracle agree at the bin edges.
    """
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    mean_len = F.round(
        F.aggregate(
            F.transform(toks, F.length),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / n,
        6,
    )
    stop_lits = F.array(*[F.lit(w) for w in SIGNAL_STOPWORDS])
    stop_frac = F.round(
        F.size(F.filter(toks, lambda w: F.array_contains(stop_lits, w)))
        .cast("double") / n,
        6,
    )
    uniq_frac = F.round(
        F.size(F.array_distinct(toks)).cast("double") / n, 6
    )
    keep = (
        (n >= min_words)
        & (n <= max_words)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
        & (stop_frac >= min_stopword_frac)
    )
    return docs.select(
        id_col,
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_frac.alias("stopword_frac"),
        uniq_frac.alias("unique_word_frac"),
        keep.alias("keep"),
    ).orderBy(id_col)


def zipf_slope(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the corpus token distribution: OLS slope of
    ln(freq) on ln(rank) for the top-k tokens (natural language sits
    near −1; a corpus of boilerplate or template spam drifts far off —
    a cheap corpus-health check).

    Plan: token hash agg (explode + groupBy — the token_topn shape),
    TakeOrderedAndProject down to the top-k tokens (freq desc, token
    asc tie-break on BOTH engines), then ``regr_slope`` over the
    k-row frame with ``row_number`` ranks. The window runs on k rows,
    not the corpus — top_k bounds it by construction (the vocab_prune
    bounded-hot-set discipline). Returns one row: (n_tokens_ranked,
    slope, intercept).
    """
    freqs = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    ranked = freqs.select(
        F.log(F.row_number().over(w).cast("double")).alias("__lr"),
        F.log(F.col("freq").cast("double")).alias("__lf"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens_ranked"),
        F.round(F.regr_slope("__lf", "__lr"), 6).alias("slope"),
        F.round(F.regr_intercept("__lf", "__lr"), 6).alias("intercept"),
    )


def unigram_logprob(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """CCNet-style unigram language-model scoring: each document's mean
    log-probability under the corpus's OWN unigram distribution,
    ``score(d) = Σ_t k_t(d) · ln(cnt(t)/N) / len(d)`` — the standard
    cheap perplexity proxy for quality filtering (low score = tokens
    the corpus itself finds improbable = gibberish/boilerplate tails).

    Plan: ONE (doc, token) hash agg gives per-doc term counts AND, by
    a second token-keyed agg over its (already-distinct) output, the
    corpus frequencies — tokens shuffle, documents never do. Corpus
    total N joins in as a broadcast 1-row aggregate. The join back of
    per-doc terms to the frequency table is a token-keyed equi-join;
    stopword skew on it is exactly what AQE skew-join splitting is
    for, and the join's probe side is (doc, token, k) triples, not
    text. Final per-doc hash agg on id.

    Returns (id_col, n_tokens, logprob) — logprob is the per-token
    mean, ≤ 0, rounded for cross-engine hash parity.
    """
    tf = (
        docs.select(
            F.col(id_col),
            F.explode(tokenize(F.col(text_col))).alias("token"),
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    freq = tf.groupBy("token").agg(F.sum("k").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n_corpus"))
    return (
        tf.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("k")
                    * F.log(F.col("cnt") / F.col("n_corpus"))
                )
                / F.sum("k"),
                6,
            ).alias("logprob"),
        )
        .orderBy(id_col)
    )


def corpus_kl_divergence(
    docs: DataFrame,
    text_col: str,
    is_p,
) -> DataFrame:
    """Distribution shift between two corpus slices — symmetric pair of
    smoothed unigram KL divergences, the monitoring statistic a
    training-data pipeline runs when a new crawl/source lands (is the
    new slice's token distribution drifting from the reference?).

    ``is_p`` is a boolean Column splitting the corpus (P = rows where
    true, Q = the rest). Add-one smoothing over the UNION vocabulary:
    P(w) = (c_p(w)+1)/(N_p+V), likewise Q; KL(P‖Q) = Σ P·ln(P/Q).

    Plan shape: ONE explode → ONE (token) hash agg producing both
    sides' counts as conditional sums (map-side partial combine — the
    shuffle carries token keys, never documents), then the three totals
    (N_p, N_q, V) reduce to a broadcast 1-row scalar and the Σ is a
    final scalar agg. Two shuffles total, both over the vocabulary
    axis, which is the only conceptually-global state and stays
    distributed.

    Determinism: every per-token term is computed from exact integer
    counts (identical on both engines); only the final Σ of ~V doubles
    is order-dependent, and the 6-dp rounding swallows the ~1e-15
    accumulation slack.
    """
    tok = docs.select(
        is_p.alias("is_p"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    counts = tok.groupBy("w").agg(
        F.sum(F.when(F.col("is_p"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("is_p"), 1).otherwise(0)).alias("cq"),
    )
    totals = counts.agg(
        F.sum("cp").alias("np"),
        F.sum("cq").alias("nq"),
        F.count(F.lit(1)).alias("v"),
    )
    p = (F.col("cp") + F.lit(1.0)) / (F.col("np") + F.col("v"))
    q = (F.col("cq") + F.lit(1.0)) / (F.col("nq") + F.col("v"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .agg(
            F.first("v").alias("v"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_pq"),
            F.round(F.sum(q * F.log(q / p)), 6).alias("kl_qp"),
        )
        .select(
            F.col("v").cast("long").alias("n_vocab"),
            "kl_pq",
            "kl_qp",
        )
    )


def inverted_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_postings: int = 20,
) -> DataFrame:
    """Token → posting-list index over the corpus: document frequency
    plus the first ``max_postings`` doc ids (sorted) per token — the
    retrieval-side complement of TF-IDF, and the lookup structure
    behind decontamination / provenance queries.

    Plan: explode → DISTINCT (token, doc_id) hash agg (map-side
    combine removes within-doc repeats before the shuffle) → one
    token-keyed agg building count + sorted, CAPPED posting array.

    Scale: the cap is the load-bearing choice — an uncapped posting
    list for a stopword IS the corpus (a single 100 GB array in one
    aggregation buffer). Production layouts shard the full list by
    (token, doc_id bucket) into fixed-size segments — same equi-join
    shape, bounded rows; the capped head here is the driver-hashable
    stand-in, and df_docs is always the full count. Postings emit as a
    joined STRING because the driver's canonicalizer cannot hash array
    cells.
    """
    posting = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        posting.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df_docs"),
            F.array_join(
                F.slice(
                    F.array_sort(F.collect_list("doc_id")), 1, max_postings
                ).cast("array<string>"),
                ",",
            ).alias("postings"),
        )
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 10,
    end_marker: str = "</w>",
) -> list[tuple[str, str, int]]:
    """Train byte-pair-encoding merges on the corpus — the tokenizer-
    training step of an LLM data pipeline, distributed the way BPE
    actually scales: the CORPUS-sized work is one word-frequency
    aggregation (explode + hash agg, shuffle carries words not
    documents); every merge iteration then runs on the word-frequency
    TABLE (vocabulary-scale — bounded by distinct words, invariant to
    corpus row count), exactly as Sennrich et al.'s reference
    implementation does.

    Per merge round, on the vocab frame: adjacent-pair explode → pair
    hash agg weighted by word count → deterministic top-1 (count desc,
    then lexicographic pair — ties resolve identically everywhere) →
    apply the merge to the symbol arrays in an Arrow-batched
    mapInPandas (vocab-scale; the corpus is never touched again). The
    vocab frame localCheckpoints per round to keep lineage flat.

    Returns the learned merge list [(left, right, pair_count), ...] in
    rank order — driver-sized by definition (n_merges rows).
    """
    import pandas as pd  # noqa: F401 — mapInPandas below

    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = words.select(
        "wc",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(end_marker))
        ).alias("syms"),
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "wc",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(
                        a.alias("left"), b.alias("right")
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((left, right, n))

        def apply_merge(it, _l=left, _r=right):
            import pandas as pd

            for pdf in it:
                def merge_one(syms):
                    out, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == _l
                            and syms[i + 1] == _r
                        ):
                            out.append(_l + _r)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    return out

                yield pd.DataFrame(
                    {
                        "wc": pdf["wc"],
                        "syms": pdf["syms"].map(
                            lambda s: merge_one(list(s))
                        ),
                    }
                )

        vocab = vocab.mapInPandas(
            apply_merge, "wc bigint, syms array<string>"
        ).localCheckpoint(eager=False)
    return merges


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Exact heavy hitters WITHOUT a full-vocabulary shuffle — the
    two-pass sketch-then-verify pattern for 100 TB frequency analysis:

    1. **Sketch pass** (mapInPandas, no shuffle): each partition builds
       a weighted Misra-Gries summary with ``k`` counters. Batches are
       pre-counted with vectorized ``value_counts`` (C speed) and only
       the ≤ distinct-tokens-per-batch merge touches Python — the
       per-partition state machine Spark's builtins cannot express,
       Arrow-batched by construction. MG guarantees every token with
       per-partition count > n_p/(k+1) survives, so the UNION of
       partition summaries is a superset of every token with GLOBAL
       count > n/(k+1) (if c(t) > Σ n_p/(k+1), some partition has
       c_p(t) > n_p/(k+1)).
    2. **Verify pass**: the candidate set (≤ partitions·k tokens —
       metadata scale) broadcasts; only candidate occurrences aggregate
       (a broadcast semi-join cuts the shuffle to the heavy tail), and
       the exact integer threshold ``cnt·(k+1) > n`` keeps precisely
       the true heavy hitters.

    The RESULT is exact and deterministic (the sketch only shapes the
    candidate superset, which is then exactly counted and filtered) —
    hence oracle-checkable against a plain GROUP BY. Contrast with
    token_topn, which shuffles the full vocabulary.
    """
    import pandas as pd  # noqa: F401 — executor-side

    toks = docs.select(F.explode(tokenize(F.col(text_col))).alias("token"))

    def mg_sketch(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, w in pdf["token"].value_counts().items():
                if tok in counters:
                    counters[tok] += int(w)
                elif len(counters) < k:
                    counters[tok] = int(w)
                else:
                    m = min(int(w), min(counters.values()))
                    counters = {
                        t: c - m for t, c in counters.items() if c > m
                    }
                    if int(w) > m:
                        counters[tok] = int(w) - m
        yield pd.DataFrame(
            {"token": list(counters), "c": list(counters.values())}
        )

    summaries = toks.mapInPandas(mg_sketch, "token string, c long")
    candidates = summaries.select("token").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("n"))
        .select("token", "cnt")
        .orderBy(F.desc("cnt"), "token")
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG/pretraining document chunking: fixed ``window``-token chunks
    every ``stride`` tokens (overlap = window - stride), ragged last
    chunk, every token covered — chunk starts run to
    ceil(max(n - window, 0) / stride), so the final chunk always
    reaches the end of the document. Pure in-row fan-out (explode of a
    sequence of starts + slice); the explode factor is ~n/stride per
    document, bounded by document length, never corpus-shaped.

    Returns (id_col, chunk_idx, n_tokens, chunk_md5) — content
    compares as md5 so downstream (and the oracle) hash chunks
    without shipping token arrays.
    """
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(n - F.lit(window), F.lit(0)) / F.lit(float(stride))
        ).cast("int")
    )
    t = docs.select(
        id_col,
        toks.alias("__toks"),
        F.sequence(F.lit(0), n_chunks - 1).alias("__idxs"),
    )
    c = t.select(
        id_col,
        F.explode("__idxs").alias("__i"),
        F.col("__toks"),
    ).select(
        id_col,
        F.col("__i").cast("bigint").alias("chunk_idx"),
        F.slice(
            F.col("__toks"), F.col("__i") * stride + 1, window
        ).alias("__chunk"),
    )
    return c.select(
        id_col,
        "chunk_idx",
        F.size("__chunk").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("__chunk"))).alias("chunk_md5"),
    )
