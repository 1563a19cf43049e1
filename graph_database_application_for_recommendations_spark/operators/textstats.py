"""Text-analysis operators: language ID, quality scoring, token counting,
source stats (the training-data-pipeline extension surface).

Everything stays in native column expressions (codegen'd); the language-ID
join uses a tiny broadcast stopword dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import gated_broadcast
from ..functions.text import STOPWORDS, normalize, tokens

CJK_RE = r"[\x{4e00}-\x{9fff}]"
PUNCT_RE = r"[.,;:!?]"


TOKEN_RE = "[a-z0-9]+"  # BPE-ish word-piece proxy; RE2/Java-identical


def token_counts(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_regex_tokens): whitespace token count plus a
    regex token count (alnum runs — the cheap BPE-ish proxy)."""
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        F.regexp_count(normalize(F.col(text_col)), F.lit(TOKEN_RE)).cast("long").alias(
            "n_regex_tokens"
        ),
    )


def repetition_scores(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Appendix A — public): (doc_id, n_tokens,
    top_token_fraction, top_2gram_fraction, dup_2gram_fraction), each
    rounded to 6dp.

    - top_token_fraction: occurrences of the most frequent token / all
      token occurrences (Gopher's "most common word" rule);
    - top_2gram_fraction: occurrences of the most frequent 2-gram / all
      2-gram positions;
    - dup_2gram_fraction: 2-gram positions whose gram occurs more than
      once / all 2-gram positions (Gopher's "duplicate n-grams" family).

    Token-count proxies of Gopher's character-fraction definitions — rank
    ordering is what the downstream threshold filter consumes. The
    line-dedup members of the rule family need newline structure, which
    this corpus doesn't carry; they'd follow the same two-aggregate
    shape over ``split(text, '\\n')``.

    Plan shape: two (doc_id, gram)-keyed count aggregates (map-side
    combinable, key space ∝ corpus tokens — no skew hotspot since the
    doc_id is in the key) feeding per-doc rollups; everything linear in
    corpus size, no joins wider than doc_id. Single-token docs degrade
    to a single degenerate "2-gram" (the token itself) on both engines.
    """
    t = tokens(F.col(text_col))
    base = documents.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
    n = F.size(F.col("_t"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, 2)),
    )
    gc = (
        base.select("doc_id", n.cast("long").alias("n_tokens"), F.explode(grams).alias("gram"))
        .groupBy("doc_id", "n_tokens", "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    gram_stats = gc.groupBy("doc_id", "n_tokens").agg(
        F.max("_c").alias("_maxg"),
        F.sum("_c").alias("_totg"),
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))).alias("_dupg"),
    )
    tc = (
        base.select("doc_id", F.explode("_t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    tok_stats = tc.groupBy("doc_id").agg(
        F.max("_c").alias("_maxt"), F.sum("_c").alias("_tott")
    )
    return gram_stats.join(tok_stats, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("_maxt") / F.col("_tott"), 6).alias("top_token_fraction"),
        F.round(F.col("_maxg") / F.col("_totg"), 6).alias("top_2gram_fraction"),
        F.round(F.col("_dupg") / F.col("_totg"), 6).alias("dup_2gram_fraction"),
    )


def quality_scores(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, punct_ratio, mean_token_len).

    Classic cheap quality heuristics: heavy stopword presence ≈ natural
    prose; extreme punctuation or token lengths ≈ boilerplate/garbage.
    """
    en = STOPWORDS["en"]
    norm = normalize(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(en)))
    punct = F.length(norm) - F.length(F.regexp_replace(norm, PUNCT_RE, ""))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_hits.cast("double") / n_tok, 6).alias("stopword_ratio"),
        F.round(punct.cast("double") / F.length(norm), 6).alias("punct_ratio"),
        F.round(total_len.cast("double") / n_tok, 6).alias("mean_token_len"),
    )


# Gopher's "contains at least 2 of ..." stop-word rule set (Rae et al.
# 2021, Appendix A — public). Frozen: part of the deterministic contract.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_signals(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The remaining members of Gopher's quality-filter rule family (Rae
    et al. 2021, "Scaling Language Models", Appendix A) that
    quality_scores / repetition_scores / line_repetition_scores don't
    cover — the symbol, bullet/ellipsis-line, alphabetic-word and
    required-stop-word rules — plus the combined pass verdict:

    (doc_id, n_words, mean_word_len, symbol_word_ratio,
     bullet_line_fraction, ellipsis_line_fraction, alpha_word_ratio,
     n_required_stopwords, gopher_pass)

    * symbol_word_ratio — '#' and '...' occurrences per word (Gopher
      drops > 0.1). Counted by exact substring arithmetic
      (length − length(replace(...))), never regex, so both engines
      agree on overlap semantics.
    * bullet_line_fraction — trimmed non-empty raw lines starting with
      '•', '- ' or '* ' (Gopher drops > 0.9).
    * ellipsis_line_fraction — lines ending with '...' or '…' (drops
      > 0.3).
    * alpha_word_ratio — words containing at least one [a-z] after
      normalization (drops < 0.8).
    * n_required_stopwords — DISTINCT hits among GOPHER_STOPWORDS
      (drops < 2).
    * gopher_pass — the conjunction, including the word-count and
      mean-word-length interval rules (word-count bounds are
      parameters; the paper's 50..100k defaults).

    Plan shape: ONE projection — every signal is a native column
    expression over the row's own text (array filter/size, substring
    arithmetic), no explode, no join, no window. At 100 TB this runs
    inside the scan stage at I/O speed, the same ideal as
    c4_paragraph_clean.
    """
    raw = F.col(text_col)
    toks = tokens(raw)
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_word_len = total_len.cast("double") / n_words
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))) / 3
    lines = F.filter(
        F.transform(F.split(raw, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("•") | l.startswith("- ") | l.startswith("* "),
        )
    )
    n_ell_lines = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    n_req_sw = F.size(
        F.array_distinct(F.filter(toks, lambda t: t.isin(GOPHER_STOPWORDS)))
    )
    line_frac = lambda n: F.when(  # noqa: E731 — tiny local expr builder
        n_lines > 0, F.round(n.cast("double") / n_lines, 6)
    ).otherwise(F.lit(0.0))
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double") / n_words, 6)
    alpha_ratio = F.round(n_alpha.cast("double") / n_words, 6)
    out = documents.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        line_frac(n_bullet).alias("bullet_line_fraction"),
        line_frac(n_ell_lines).alias("ellipsis_line_fraction"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_req_sw.cast("long").alias("n_required_stopwords"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_fraction") <= 0.9)
        & (F.col("ellipsis_line_fraction") <= 0.3)
        & (F.col("alpha_word_ratio") >= 0.8)
        & (F.col("n_required_stopwords") >= 2),
    )


def language_id(
    spark: SparkSession, documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, lang_guess): stopword-hit argmax over the frozen per-language
    lists, CJK-script override for 'zh', 'und' when nothing matches.

    Deterministic: ties broken by language code ascending.
    """
    stop_rows = [(lang, w) for lang, ws in sorted(STOPWORDS.items()) for w in ws]
    stop_dim = spark.createDataFrame(stop_rows, "lang STRING, word STRING")
    par = documents.sparkSession.sparkContext.defaultParallelism
    norm_df = documents.repartition(par).select(
        F.col(id_col).alias("doc_id"), normalize(F.col(text_col)).alias("norm")
    )
    tok = norm_df.select("doc_id", F.explode(F.split(F.col("norm"), " ")).alias("token"))
    hits = (
        tok.join(gated_broadcast(stop_dim, "fixed-size construction: frozen per-language stopword lists"), tok.token == stop_dim.word)
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("h"), F.asc("lang"))
    best = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    cjk = F.length(F.col("norm")) - F.length(F.regexp_replace(F.col("norm"), CJK_RE, ""))
    return (
        norm_df.join(best.select("doc_id", "lang"), "doc_id", "left")
        .select(
            "doc_id",
            F.when(cjk.cast("double") / F.length("norm") > 0.3, F.lit("zh"))
            .otherwise(F.coalesce(F.col("lang"), F.lit("und")))
            .alias("lang_guess"),
        )
    )


def tfidf_top_terms(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 5,
) -> DataFrame:
    """(doc_id, token, tfidf): top-N characteristic terms per document.

    tf = term count / doc token count; idf = ln(N / df) over distinct
    document frequency. Two shuffles (doc-term counts, df counts); the
    df table is VOCABULARY-sized, so it is never broadcast-hinted —
    AQE broadcasts it when the actual runtime size is small and shuffles
    beyond (round-8: the old forced hint was the source_signatures OOM
    class). Scores rounded to 6dp with token tie-break for cross-engine
    determinism.
    """
    par = documents.sparkSession.sparkContext.defaultParallelism
    tok = documents.repartition(par).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    n_docs = documents.count()
    term_counts = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tc"))
    doc_len = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_counts = term_counts.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        term_counts.join(doc_len, "doc_id")
        .join(df_counts, "token")
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("tc").cast("double") / F.col("dl"))
                * F.log(F.lit(float(n_docs)) / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= top_n
    ).drop("_rn")


def collocations_pmi(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Corpus-level collocation mining: the ``top_k`` adjacent token pairs
    by pointwise mutual information (Church & Hanks 1990, public) among
    pairs occurring at least ``min_count`` times.

    (w1, w2, pair_count, pmi) with ``pmi = ln(p(w1,w2) / (p(w1)·p(w2)))``
    where pair probability is over bigram positions and token probability
    over token positions; 6dp-rounded, ties by (w1, w2).

    Plan shape: one token explode and one bigram explode (each linear in
    corpus tokens) feeding map-side-combinable hash aggregates keyed by
    token / pair; the two corpus totals ride a single 1-row aggregate
    each and broadcast back as literal-free 1-row build sides. The pair
    table is ``min_count``-filtered *before* the unigram joins, so join
    input is the (vocab²-bounded, in practice tiny) collocation candidate
    set, never the corpus. Selection is a global TakeOrdered of
    ``top_k`` rows — no full sort.
    """
    par = documents.sparkSession.sparkContext.defaultParallelism
    base = documents.repartition(par).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
    )
    n = F.size(F.col("_t"))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(F.col("_t"), i).alias("w1"),
                F.element_at(F.col("_t"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    tok = base.select(F.explode("_t").alias("token"))
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c_tok"))
    total_tok = uni.agg(F.sum("c_tok").alias("n_tok"))
    bg = base.select(F.explode(bigrams).alias("b")).select("b.w1", "b.w2")
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    total_pair = pair.agg(F.sum("pair_count").alias("n_pair"))
    cand = pair.filter(F.col("pair_count") >= min_count)
    scored = (
        cand.join(uni.withColumnRenamed("token", "w1").withColumnRenamed("c_tok", "_c1"), "w1")
        .join(uni.withColumnRenamed("token", "w2").withColumnRenamed("c_tok", "_c2"), "w2")
        .crossJoin(gated_broadcast(total_tok, "1-row global aggregate"))
        .crossJoin(gated_broadcast(total_pair, "1-row global aggregate"))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") * F.col("n_tok").cast("double") * F.col("n_tok"))
                    / (F.col("n_pair").cast("double") * F.col("_c1") * F.col("_c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(top_k)


def source_stats(documents: DataFrame) -> DataFrame:
    """(source, n_docs, avg_chars, total_tokens): corpus profile by source."""
    return (
        documents.select(
            "source",
            F.col("n_chars"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def build_vocabulary(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_size: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """(token_id, token, count, n_docs): the tokenizer-vocabulary table —
    dense ids assigned by (count DESC, token ASC), so id 0 is the most
    frequent token and the mapping is fully deterministic (a vocabulary
    must be reproducible bit-for-bit across corpus rebuilds or every
    downstream checkpoint breaks).

    One explode + one hash aggregate (map-side combinable). The id
    assignment is TWO-LEVEL (VERDICT r6 item 3 — the packing.py offsets
    pattern): rank(count DESC, token ASC) decomposes into a cumulative
    offset over the (count, token-2-char-prefix) HISTOGRAM — a second
    aggregate, |distinct (count, prefix)| rows, the only thing that ever
    crosses an unpartitioned window — plus a per-(count, prefix) bucket
    rank. A web-corpus vocabulary (10⁸+ tokens, half of them hapax
    legomena) never single-task sorts: the hapax bucket splits across
    prefixes, and prefix truncation is order-monotonic so the composed
    rank is bit-identical to the global one.
    """
    counts = token_count_table(documents, id_col, text_col)
    return rank_vocabulary(counts, max_size=max_size, min_count=min_count)


def token_count_table(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, count, n_docs): the corpus token-count table — one explode
    + one hash aggregate (map-side combinable). The additive half of
    vocabulary building: count tables from disjoint document sets SUM
    into the whole-corpus table, which is what incremental maintenance
    (vocab_delta_append) exploits."""
    par = documents.sparkSession.sparkContext.defaultParallelism
    return (
        documents.repartition(par)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def rank_vocabulary(
    counts: DataFrame,
    max_size: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Dense deterministic ids over a (token, count, n_docs) table — the
    two-level (count, prefix-bucket) rank documented on
    build_vocabulary, exposed separately so consolidated incremental
    counts rank through the identical plan."""
    counts = counts.filter(F.col("count") >= min_count)
    pfx = F.substring("token", 1, 2)
    hist = counts.groupBy(F.col("count").alias("count"), pfx.alias("_pfx")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w_off = Window.orderBy(F.desc("count"), F.asc("_pfx")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = hist.select(
        "count", "_pfx", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("count", "_pfx").orderBy("token")
    vocab = (
        counts.withColumn("_pfx", pfx)
        .join(gated_broadcast(offsets, "two-level rank histogram: |distinct (count, 2-char prefix)| rows"), ["count", "_pfx"])
        .withColumn(
            "token_id",
            (F.col("_off") + F.row_number().over(w_in) - 1).cast("long"),
        )
    )
    if max_size is not None:
        vocab = vocab.filter(F.col("token_id") < max_size)
    return vocab.select("token_id", "token", "count", "n_docs")


def encode_corpus(
    documents: DataFrame,
    vocabulary: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """(doc_id, pos, token_id): the tokenized training corpus — each
    document's token stream mapped through the vocabulary, out-of-
    vocabulary tokens marked ``oov_id``. The long scalar shape feeds
    sequence packing / shard writing directly and stays oracle-checkable.

    The join is left to Catalyst: a tokenizer vocabulary is broadcast-
    sized by construction (≤ a few hundred MB for millions of entries),
    so the corpus side — the 100 TB side — never shuffles.
    """
    tokp = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    return (
        tokp.join(vocabulary.select("token", "token_id"), "token", "left")
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("long").alias("token_id"),
        )
    )


def decode_corpus(
    encoded: DataFrame,
    vocabulary: DataFrame,
    oov_token: str = "<unk>",
) -> DataFrame:
    """(doc_id, text): the inverse of :func:`encode_corpus` — token ids
    mapped back through the vocabulary (OOV ids render as ``oov_token``),
    reassembled in position order. With the whitespace tokenizer,
    decode(encode(x)) == normalize(x) up to OOV replacement — the
    round-trip invariant the q_corpus_decode oracle hash-checks, which
    pins the id mapping's invertibility (a duplicated or shifted token_id
    breaks the reassembled text).

    Scale shape mirrors the encoder: the vocabulary joins WITHOUT a
    forced broadcast hint (it is vocabulary-sized — AQE broadcasts it
    while it actually fits, shuffles beyond); the corpus-sized side sees
    one aggregate keyed by doc_id (the natural output partitioning for
    shard writing)."""
    dec = encoded.join(
        vocabulary.select("token_id", "token"), "token_id", "left"
    ).select(
        "doc_id", "pos", F.coalesce(F.col("token"), F.lit(oov_token)).alias("token")
    )
    return (
        dec.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "token"))
            ).alias("_pt")
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.transform("_pt", lambda s: s["token"])).alias("text"),
        )
    )


# --- PII scrubbing -----------------------------------------------------------

# Patterns kept to the Java/RE2 common subset so the Spark plan and the
# DuckDB oracle compile the same automaton. Heuristics by design (public
# pipeline practice, e.g. C4's cleanup passes): email, IPv4, then a
# digit-run phone catch-all — order matters, the phone pattern would
# otherwise eat IPv4 octets.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d() -]{6,}\d"


def scrub_expr(text):
    """The canonical email → IP → phone redaction chain (order matters:
    the phone pattern would otherwise eat IPv4 octets) — one definition
    shared by the batch operator and the streaming ingest twin."""
    clean = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IP_RE, "<IP>")
    return F.regexp_replace(clean, PII_PHONE_RE, "<PHONE>")


def quality_keep_expr(
    text,
    min_tokens: int = 10,
    max_tokens: int = 500,
    min_stopword_ratio: float = 0.01,
):
    """Boolean keep-predicate form of the quality filter (token bounds +
    English-stopword floor) — shared by batch compositions and streaming."""
    toks = tokens(text)
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    return (
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & ((stop_hits.cast("double") / n_tok) >= min_stopword_ratio)
    )


def scrub_pii(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones): PII redaction with
    per-kind match counts — the standard pre-training privacy pass.

    Pure ``regexp_replace``/``regexp_count`` column expressions: one
    codegen'd projection, no shuffle, no UDF — at 100 TB this runs at scan
    speed. Counts are measured on the ORIGINAL text; replacements are
    applied email → IP → phone so earlier placeholders aren't re-matched.
    """
    t = F.col(text_col)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        scrub_expr(t).alias("clean_text"),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IP_RE)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
    )


def lm_bigram_scores(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-bigram language-model typicality score — the cheap proxy
    for CCNet-style LM-perplexity quality filtering (Wenzek et al. 2020,
    public): score(doc) = mean over the doc's character-bigram positions
    of log2 P(c2 | c1), with P estimated from the whole corpus.

    (doc_id, n_bigrams, lm_score) with lm_score rounded to 6dp; docs
    whose normalized text is shorter than 2 characters are excluded
    (they have no bigram positions). Low scores mark texts whose
    character transitions are atypical for the corpus — boilerplate,
    encoding noise, non-linguistic content.

    Plan shape: ONE |chars|-proportional bigram explode, partial-aggregated
    to per-(doc, bigram) counts and pinned (``materialize``) — BOTH the
    model (a further groupBy(bigram) sum; at most |charset|² rows, so it
    broadcasts back regardless of corpus size) and the per-doc score (a
    count-weighted mean over the pinned table) derive from it. The r9
    shape ran the normalize+explode corpus pass TWICE (once for the model
    counts, once for the scoring stream); the weighted mean
    Σ c·log2P / Σ c equals the positional AVG exactly in real arithmetic
    (every position of a (doc, bigram) group carries the same log-prob)
    and to well under the 6dp output rounding in floats. No UDFs, no
    windows; linear at 100 TB.
    """
    from ..plans import materialize

    dc = materialize(_doc_bigram_counts(documents, id_col, text_col))
    # pin the model counts too: they are bounded by |charset|² but derive
    # from dc, which would otherwise be re-scanned by each of the model's
    # consumers (the first-char totals and the broadcast build)
    big = materialize(dc.groupBy("bigram").agg(F.sum("_c").alias("_cnt")))
    return _scores_from_doc_counts(dc, big)


def _char_bigrams(documents: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from ..functions.text import normalize

    norm = normalize(F.col(text_col))
    base = documents.select(F.col(id_col).alias("doc_id"), norm.alias("_n")).filter(
        F.char_length("_n") >= 2
    )
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.char_length("_n") - 1),
                lambda i: F.substring(F.col("_n"), i, 2),
            )
        ).alias("bigram"),
    )


def _doc_bigram_counts(
    documents: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, bigram, _c): per-document character-bigram occurrence
    counts — the compressed form of the position stream (guide: aggregate
    before you shuffle). Both the corpus model and the per-doc score
    derive from it, so the corpus is normalized+exploded exactly once."""
    return (
        _char_bigrams(documents, id_col, text_col)
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def _scores_from_doc_counts(dc: DataFrame, big: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, lm_score) from per-doc bigram counts ``dc`` and
    the model count table ``big``. n_bigrams = Σ counts over bigrams the
    model covers (= the matched-position count); lm_score is the count-
    weighted mean log2 P(c2|c1), identical to the per-position AVG because
    every position of a (doc, bigram) group carries the same log-prob."""
    pre = (
        big.groupBy(F.substring("bigram", 1, 1).alias("_c1"))
        .agg(F.sum("_cnt").alias("_tot"))
    )
    model = big.join(
        gated_broadcast(pre, "character-domain aggregate: one row per leading char, bounded by the charset"), F.substring(big["bigram"], 1, 1) == pre["_c1"]
    ).select("bigram", (F.log2(F.col("_cnt") / F.col("_tot"))).alias("_lp"))
    return (
        dc.join(gated_broadcast(model, "character-bigram model: bounded by |charset|^2 rows"), "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum("_c").alias("n_bigrams"),
            F.round(
                F.sum(F.col("_c") * F.col("_lp")) / F.sum("_c"), 6
            ).alias("lm_score"),
        )
    )


def bigram_count_table(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(bigram, _cnt): the character-bigram count table — the ADDITIVE
    half of the CCNet-proxy LM (lm_bigram_scores): counts from disjoint
    batches sum into the whole-corpus table, so the filtering model is
    maintainable incrementally (etl.lm_delta_append) and retractable —
    another group-algebra sidecar; the first-char totals (the
    conditional's denominator) are DERIVED from this table at
    consolidation, never stored, so the two can't drift."""
    return (
        _char_bigrams(documents, id_col, text_col)
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def consolidate_bigram_counts(deltas: DataFrame) -> DataFrame:
    """(bigram, _cnt) summed over per-batch deltas; zero-sum rows (fully
    retracted) drop."""
    return (
        deltas.groupBy("bigram")
        .agg(F.sum("_cnt").alias("_cnt"))
        .filter(F.col("_cnt") > 0)
    )


def lm_scores_from_counts(
    documents: DataFrame,
    big: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """lm_bigram_scores with the MODEL counts supplied (direct or
    consolidated from sidecar deltas — integer counts, so the derived
    log-probabilities are identical either way; q_ingest_lm pins it).
    Scoring uses the same per-(doc, bigram)-count weighted-mean form as
    lm_bigram_scores (the two faces must stay value-identical — the
    sidecar tests pin it), which also shrinks the model-join input from
    the position stream to its per-doc counts."""
    return _scores_from_doc_counts(
        _doc_bigram_counts(documents, id_col, text_col), big
    )


def length_quantiles_by_source(
    documents: DataFrame,
    quantiles: list[tuple[int, int]] = [(1, 2), (9, 10)],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, q, n_tokens_at_q): per-source EXACT token-length
    quantiles — the profiling table behind per-source length filters and
    packing bucket choices. Quantiles are given as rationals (num, den)
    so the rank threshold ceil(q·n) computes in INTEGER arithmetic —
    (num·n + den − 1) div den — never a float product whose ceil can sit
    on a representation boundary; the answer is the smallest length
    whose cumulative count reaches the threshold (percentile_disc
    semantics, no interpolation — engine-exact).

    Plan shape: per-doc counts → per-(source, length) histogram →
    ONE cumulative window PARTITIONED BY SOURCE over the histogram
    (bounded: |distinct lengths| rows per source, never the corpus) →
    a quantile-literal cross join + min aggregate."""
    tc = documents.select(
        F.col(source_col).alias("source"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    hist = tc.groupBy("source", "n_tokens").agg(F.count(F.lit(1)).alias("_c"))
    totals = tc.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy("source").orderBy("n_tokens")
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).join(totals, "source")
    spark = documents.sparkSession
    qdim = spark.createDataFrame(quantiles, "num int, den int")
    thresh = (F.col("num") * F.col("_n") + F.col("den") - 1) / F.col("den")
    return (
        cum.crossJoin(gated_broadcast(qdim, "fixed-size construction: literal quantile dimension"))
        .filter(F.col("_cum") >= F.floor(thresh))
        .groupBy("source", "num", "den")
        .agg(F.min("n_tokens").alias("n_tokens_at_q"))
        .select(
            "source",
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias("q"),
            "n_tokens_at_q",
        )
    )


def length_quantile_keep(
    documents: DataFrame,
    q: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-derived length filter: drop the shortest ``q``
    fraction of documents by token count, with the threshold computed as
    an *exact* quantile over a value histogram (no interpolation, no
    global sort of the corpus).

    (doc_id, n_tokens) for every kept doc. The threshold t is the
    smallest token count whose cumulative histogram mass reaches
    ``ceil(q·n)``; docs with n_tokens ≥ t are kept — so ties at the
    threshold are resolved identically on any engine (integer compares
    only, unlike percentile_cont's float interpolation).

    Plan shape: per-doc token count (scan-resident), histogram aggregate
    (map-side combinable, |distinct lengths| rows), ONE window over the
    histogram — not the corpus — to get cumulative mass, then a 1-row
    threshold broadcast back as a filter. The only unpartitioned window
    input is bounded by the longest document, not the corpus size.
    """
    from ..functions.text import tokens

    tc = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    hist = tc.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "n_tokens",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(Window.partitionBy()).alias("_n"),
    )
    thresh = (
        cum.filter(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n")))
        .agg(F.min("n_tokens").alias("_t"))
    )
    return tc.join(gated_broadcast(thresh, "1-row global aggregate")).filter(
        F.col("n_tokens") >= F.col("_t")
    ).select("doc_id", "n_tokens")


def bm25_scores(
    documents: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every document against a fixed term set
    (Robertson & Zaragoza 2009, public; Lucene's non-negative idf
    variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

    (doc_id, n_hits, score) for the ``top_n`` highest-scoring docs,
    score rounded to 6dp, ordered/tie-broken by (score desc, doc_id);
    only documents containing at least one query term are candidates.

    Plan shape: the corpus explodes to (doc, token) once; tf/df
    aggregates run over the term-filtered subset (the filter sits
    directly on the exploded stream, so the aggregate input is
    |term hits|, not |tokens|); N and avgdl ride one scalar-aggregate
    row that cross-joins (1-row broadcast) into the scoring expression.
    Final selection is TakeOrdered. At 100 TB nothing shuffles wider
    than the per-(doc, term) hit counts.
    """
    t = tokens(F.col(text_col))
    toks = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(t).alias("token")
    )
    dl = documents.select(
        F.col(id_col).alias("doc_id"), F.size(t).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = toks.filter(F.col("token").isin(terms))
    tf = hits.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        tf.join(gated_broadcast(df_t, "term-filtered aggregate: one row per query term"), "token")
        .join(dl, "doc_id")
        .crossJoin(gated_broadcast(stats, "1-row global aggregate"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.sum(contrib), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(top_n)
    )


def span_corruption(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_percent: int = 15,
    span_len: int = 3,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, corrupted_text, targets, n_masked): the T5/UL2 span-
    corruption training objective (Raffel et al. JMLR 2020 §3.1.4,
    public) built as a deterministic corpus transform: the token stream
    splits into ``span_len`` blocks, each block masks iff
    md5(doc_id|block, seed) % 100 < mask_percent, the k-th masked block
    becomes sentinel ``<extra_id_k>`` in the input and contributes
    ``<extra_id_k> tokens…`` to the target, which ends with the final
    sentinel ``<extra_id_{n_masked}>`` (T5's convention; unlike T5,
    adjacent masked blocks keep separate sentinels — documented
    deviation, deterministic either way).

    md5-derived masking makes the objective REPRODUCIBLE: re-running the
    pipeline regenerates byte-identical training pairs (and the DuckDB
    oracle re-derives them — q_corpus_span_corrupt). Plan shape: one
    block explode, one per-DOC running-count window (the sentinel
    index), one per-doc ordered reassembly — |tokens|-linear, the same
    shape as the CDC chunker."""
    from ..functions.text import md5_hash32

    t = tokens(F.col(text_col))
    nb = F.ceil(F.size(t) / F.lit(span_len)).cast("int")
    blocks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nb - 1),
                lambda j: F.concat_ws(" ", F.slice(t, j * span_len + 1, span_len)),
            )
        ).alias("j", "btext"),
    )
    masked = (
        md5_hash32(
            F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("j").cast("string")),
            seed=seed,
        )
        % 100
        < mask_percent
    )
    w = Window.partitionBy("doc_id").orderBy("j").rowsBetween(
        Window.unboundedPreceding, -1
    )
    kk = blocks.select(
        "doc_id",
        "j",
        "btext",
        masked.alias("_m"),
    ).withColumn(
        "_k",
        F.coalesce(F.sum(F.col("_m").cast("int")).over(w), F.lit(0)).cast("long"),
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("_k").cast("string"), F.lit(">"))
    piece = F.when(F.col("_m"), sentinel).otherwise(F.col("btext"))
    target_part = F.when(
        F.col("_m"), F.concat(sentinel, F.lit(" "), F.col("btext"))
    )  # null (dropped by collect_list) for unmasked blocks
    agg = kk.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("j"), piece.alias("p")))),
                lambda x: x["p"],
            ),
        ).alias("corrupted_text"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("j"), target_part.alias("p")))
                ),
                lambda x: x["p"],
            ),
        ).alias("_t"),
        F.sum(F.col("_m").cast("long")).alias("n_masked"),
    )
    final_sentinel = F.concat(
        F.lit("<extra_id_"), F.col("n_masked").cast("string"), F.lit(">")
    )
    return agg.select(
        "doc_id",
        "corrupted_text",
        F.when(F.col("n_masked") == 0, F.lit("<extra_id_0>"))
        .otherwise(F.concat(F.col("_t"), F.lit(" "), final_sentinel))
        .alias("targets"),
        "n_masked",
    )


SENTENCE_RE = "[^.!?]+[.!?]*"  # no lookarounds: RE2 (DuckDB) and Java agree


def split_sentences(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sent_idx, sentence): rule-based sentence segmentation —
    maximal runs of non-terminal characters plus their trailing
    [.!?]-run, trimmed, whitespace-only runs dropped (the C4/Gopher
    sentence-count convention turned into an exploder; the unit every
    sentence-level filter/packer downstream consumes).

    Deliberately regex-minimal: ``[^.!?]+[.!?]*`` has no lookarounds or
    backreferences, so RE2 (the oracle engine) and Java regex tokenize
    identically. Plan shape: one regexp_extract_all + posexplode —
    per-row, no shuffle, linear in corpus characters."""
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sents).alias("sent_idx", "sentence"),
    ).select("doc_id", F.col("sent_idx").cast("long").alias("sent_idx"), "sentence")


def quality_hist_table(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, q_bucket, n_docs): per-source histogram of the stop-word
    quality signal in integer deciles — q_bucket = min(⌊10·stop_hits/
    n_tokens⌋, 9). The distribution profile behind mixture/threshold
    decisions ("what fraction of source X clears quality θ"), and the
    ADDITIVE half of incremental quality monitoring: histograms from
    disjoint batches sum (quality_hist_delta_append).

    The bucket is derived from the two INTEGER counts, so it is exact
    cross-engine: for a,b ≤ 2^31 the correctly-rounded double a·10/b
    can't land on the wrong side of an integer (the nearest rational
    gap 1/b dwarfs the ulp), so floor equals integer division in both
    engines. One explode + two aggregates, doc_id keyed then
    (source, bucket) keyed — never wider than the corpus scan."""
    en = STOPWORDS["en"]
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(en)))
    bucket = F.least(
        F.floor(F.lit(10.0) * stop_hits / n_tok), F.lit(9)
    ).cast("long")
    return (
        documents.select(F.col(source_col).alias("source"), bucket.alias("q_bucket"))
        .groupBy("source", "q_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# The six quality-filter rules compare a ratio of two per-doc INTEGER
# counts against a float threshold. Quantizing every threshold to this
# fixed scale in Python (one integer constant per rule) lets BOTH engines
# evaluate each rule as a pure BIGINT cross-multiplication
# (numerator·SCALE <?> denominator·threshold_int) — no double arithmetic,
# no ROUND, nothing version-sensitive left to disagree on. Round-7's one
# driver-red hash row (q_corpus_filter_report) was exactly a
# double-threshold compare diverging on the driver's DuckDB build while
# matching locally; this representation makes that class impossible.
FILTER_RULE_SCALE = 1_000_000


def _ratio_threshold_int(x: float) -> int:
    return int(round(x * FILTER_RULE_SCALE))


def filter_flags(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 15,
    max_tokens: int = 300,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    min_stopword_ratio: float = 0.05,
    max_top_token_fraction: float = 0.2,
    max_dup_2gram_fraction: float = 0.3,
) -> DataFrame:
    """Doc-grain quality-filter verdicts — one row per document carrying
    the raw INTEGER signal counts and each rule's 0/1 flag:

    (doc_id, n_tokens, total_token_len, stop_hits, top_token_count,
     dup_2gram_positions, total_2gram_positions, f_too_short, f_too_long,
     f_word_len, f_stopword_floor, f_top_token, f_dup_2gram, f_any)

    This is the debuggable face of filter_ablation_report (round-7
    VERDICT item 1): a cross-engine flip localizes to ONE doc and ONE
    rule here, instead of vanishing into a 7-row rollup's counts. Every
    output is a BIGINT, and every threshold compare is exact integer
    cross-multiplication at FILTER_RULE_SCALE (numerator·10⁶ vs
    denominator·thresholdᵢₙₜ) — zero doubles anywhere, so no
    engine/version pair can disagree. Rules (Gopher / C4 family, Rae et
    al. 2021 App. A): token-count bounds, mean-word-length interval,
    stop-word floor, most-common-token and duplicate-2-gram ceilings.

    Plan shape: one scan-stage projection for the array-derivable counts
    (n_tokens, total length, stop hits), plus the two (doc_id, gram)-
    keyed count aggregates repetition_scores uses (map-side combinable,
    doc_id in the key — no hotspot), joined back on doc_id. Linear in
    corpus size; no window, no corpus-wide join."""
    en = STOPWORDS["en"]
    t = tokens(F.col(text_col))
    base = documents.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
    n = F.size(F.col("_t"))
    scal = base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.aggregate(
            "_t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_token_len"),
        F.size(F.filter("_t", lambda x: x.isin(en))).cast("long").alias("stop_hits"),
    )
    tc = (
        base.select("doc_id", F.explode("_t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    topt = tc.groupBy("doc_id").agg(F.max("_c").alias("top_token_count"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, 2)),
    )
    gc = (
        base.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    gstats = gc.groupBy("doc_id").agg(
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))).alias(
            "dup_2gram_positions"
        ),
        F.sum("_c").alias("total_2gram_positions"),
    )
    j = scal.join(topt, "doc_id").join(gstats, "doc_id")
    S = F.lit(FILTER_RULE_SCALE)
    th_mwl_lo = F.lit(_ratio_threshold_int(min_mean_token_len))
    th_mwl_hi = F.lit(_ratio_threshold_int(max_mean_token_len))
    th_sw = F.lit(_ratio_threshold_int(min_stopword_ratio))
    th_top = F.lit(_ratio_threshold_int(max_top_token_fraction))
    th_dup = F.lit(_ratio_threshold_int(max_dup_2gram_fraction))
    rules = {
        "too_short": F.col("n_tokens") < min_tokens,
        "too_long": F.col("n_tokens") > max_tokens,
        "word_len": (F.col("total_token_len") * S < F.col("n_tokens") * th_mwl_lo)
        | (F.col("total_token_len") * S > F.col("n_tokens") * th_mwl_hi),
        "stopword_floor": F.col("stop_hits") * S < F.col("n_tokens") * th_sw,
        "top_token": F.col("top_token_count") * S > F.col("n_tokens") * th_top,
        "dup_2gram": F.col("dup_2gram_positions") * S
        > F.col("total_2gram_positions") * th_dup,
    }
    any_fail = None
    for c in rules.values():
        any_fail = c if any_fail is None else (any_fail | c)
    return j.select(
        "doc_id",
        "n_tokens",
        "total_token_len",
        "stop_hits",
        "top_token_count",
        "dup_2gram_positions",
        "total_2gram_positions",
        *[c.cast("long").alias(f"f_{name}") for name, c in rules.items()],
        any_fail.cast("long").alias("f_any"),
    )


def filter_ablation_report(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 15,
    max_tokens: int = 300,
    min_stopword_ratio: float = 0.05,
    max_top_token_fraction: float = 0.2,
    max_dup_2gram_fraction: float = 0.3,
) -> DataFrame:
    """(rule, n_failed, fail_rate): the per-rule kill count of the
    standard quality-filter stack over a corpus — the ablation report
    every pipeline team produces before committing to thresholds ("which
    rule is doing the work, which is dead weight, which would nuke a
    third of the corpus"). Rules: token-count bounds, mean-word-length
    interval (Gopher), stop-word floor, most-common-token and duplicate-
    2-gram ceilings (Gopher repetition), plus the 'any' conjunction row.

    Derived from filter_flags — the doc-grain face with exact-integer
    threshold compares (see there for why) — by ONE pass of flag sums;
    the report is |rules| rows regardless of corpus size."""
    flags = filter_flags(
        documents,
        id_col,
        text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        min_stopword_ratio=min_stopword_ratio,
        max_top_token_fraction=max_top_token_fraction,
        max_dup_2gram_fraction=max_dup_2gram_fraction,
    )
    names = [
        "too_short",
        "too_long",
        "word_len",
        "stopword_floor",
        "top_token",
        "dup_2gram",
        "any",
    ]
    wide = flags.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"f_{name}").alias(f"_{name}") for name in names],
    )
    # unpivot the one-row wide aggregate into (rule, n_failed, fail_rate)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(f"_{name}").alias("n_failed"),
                        F.round(F.col(f"_{name}") / F.col("_n"), 6).alias("fail_rate"),
                    )
                    for name in names
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.rule", "s.n_failed", "s.fail_rate")


def quality_drift_report(
    batch_docs: DataFrame,
    baseline_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    num_buckets: int = 10,
) -> DataFrame:
    """(source, n_docs, kl): per-source data-drift score for an incoming
    batch — KL(batch ‖ baseline) over the stop-word-decile quality
    histogram (quality_hist_table) with add-1 smoothing on the fixed
    ``num_buckets`` domain. The ingest-monitoring primitive: a source
    whose new crawl slice suddenly ships different-quality text shows a
    KL spike batches before any downstream metric moves.

    Sources with no batch rows score against the uniform smoothed
    distribution (coalesce-0 counts) — deterministic, and a large KL
    there is itself the signal ("this source went silent"). Plan shape:
    two bounded histograms (the corpus side can equally come from the
    consolidated sidecar — consolidate_quality_hist — never a rescan), a
    |sources|×num_buckets dense spine, one per-source sum. Everything
    after the histograms is broadcast-sized."""
    bh = quality_hist_table(batch_docs, id_col, text_col, source_col)
    ch = quality_hist_table(baseline_docs, id_col, text_col, source_col)
    return quality_drift_from_hists(bh, ch, num_buckets)


def quality_drift_from_hists(
    batch_hist: DataFrame, baseline_hist: DataFrame, num_buckets: int = 10
) -> DataFrame:
    """The consolidation face of quality_drift_report: KL from two
    already-aggregated (source, q_bucket, n_docs) histograms — the batch
    side is one bounded delta, the baseline side the maintained sidecar."""
    spark = batch_hist.sparkSession
    spine = (
        baseline_hist.select("source")
        .distinct()
        .crossJoin(
            spark.range(num_buckets).select(F.col("id").cast("long").alias("q_bucket"))
        )
    )
    bt = batch_hist.groupBy("source").agg(F.sum("n_docs").alias("_nb"))
    ct = baseline_hist.groupBy("source").agg(F.sum("n_docs").alias("_nc"))
    j = (
        spine.join(batch_hist.withColumnRenamed("n_docs", "_cb"), ["source", "q_bucket"], "left")
        .join(baseline_hist.withColumnRenamed("n_docs", "_cc"), ["source", "q_bucket"], "left")
        .join(bt, "source", "left")
        .join(ct, "source")
        .select(
            "source",
            F.coalesce("_cb", F.lit(0)).alias("_cb"),
            F.coalesce("_cc", F.lit(0)).alias("_cc"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"),
            "_nc",
        )
    )
    p_b = (F.col("_cb") + 1).cast("double") / (F.col("_nb") + num_buckets)
    p_c = (F.col("_cc") + 1).cast("double") / (F.col("_nc") + num_buckets)
    return (
        j.select("source", "_nb", (p_b * F.log(p_b / p_c)).alias("_t"))
        .groupBy("source")
        .agg(
            F.max("_nb").cast("long").alias("n_docs"),
            F.round(F.sum("_t"), 6).alias("kl"),
        )
    )


def consolidate_quality_hist(deltas: DataFrame) -> DataFrame:
    """Whole-corpus (source, q_bucket, n_docs) from per-batch histogram
    deltas — one sum aggregate; counts are additive. Cells summing to
    zero (every member retracted) drop, so the consolidated table equals
    the direct histogram over the surviving corpus."""
    return (
        deltas.groupBy("source", "q_bucket")
        .agg(F.sum("n_docs").alias("n_docs"))
        .filter(F.col("n_docs") > 0)
    )


def bm25_scores_from_stats(
    documents: DataFrame,
    token_stats: DataFrame,
    corpus_stats: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 scoring with the MODEL statistics read from maintained
    sidecars instead of a corpus rescan — the retrieval face of the
    incremental-maintenance algebra (DESIGN.md round 7): ``token_stats``
    is the consolidated (token, count, n_docs) table (n_docs = per-term
    document frequency, additive across append-only batches) and
    ``corpus_stats`` the consolidated one-row (n_docs, n_tokens) scalar
    delta sum (N and avgdl = n_tokens/n_docs).

    Bit-identical to :func:`bm25_scores` over the same corpus: df and N
    are integers either way, and avgdl — Spark's avg being sum/count —
    sums integer-valued doubles, which is EXACT in IEEE double up to
    2^53 tokens, so the division yields the same double as the sidecar's
    Σn_tokens/Σn_docs (q_ingest_bm25's oracle pins it). The scoring
    expression is shared verbatim.

    Scale shape: the docs being scored explode/aggregate exactly as in
    bm25_scores; the model joins are a broadcast (term set) and a 1-row
    cross join. What the sidecar buys at 100 TB: scoring a NEW batch
    against corpus-accurate statistics costs the batch, never the corpus.
    """
    t = tokens(F.col(text_col))
    toks = documents.select(F.col(id_col).alias("doc_id"), F.explode(t).alias("token"))
    dl = documents.select(
        F.col(id_col).alias("doc_id"), F.size(t).cast("double").alias("dl")
    )
    stats = corpus_stats.select(
        F.col("n_docs").cast("double").alias("n_docs"),
        (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")).alias("avgdl"),
    )
    hits = toks.filter(F.col("token").isin(terms))
    tf = hits.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = token_stats.filter(F.col("token").isin(terms)).select(
        "token", F.col("n_docs").cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        tf.join(gated_broadcast(df_t, "term-filtered aggregate: one row per query term"), "token")
        .join(dl, "doc_id")
        .crossJoin(gated_broadcast(stats, "1-row global aggregate"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.sum(contrib), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(top_n)
    )


def chunk_documents(
    documents: DataFrame,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (the RAG-ingestion primitive):
    token windows of ``size`` starting every ``stride`` tokens, so
    consecutive chunks overlap by ``size - stride``.

    (doc_id, chunk_id, start_pos, n_tokens, chunk_text) — chunk_id is the
    0-based window index, start_pos its 0-based token offset; a document
    with n ≤ size tokens yields exactly one chunk. Number of chunks is
    ``1 + ceil((n - size)/stride)`` for n > size — the last window may be
    shorter than ``size`` but never empty, and every token is covered.

    Plan shape: pure per-row explode (sequence → transform → posexplode
    of array slices); |chunks|-proportional output, no joins, no windows
    — embarrassingly parallel at any scale.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int")
    )
    base = documents.select(F.col(id_col).alias("doc_id"), t.alias("_t"), n_chunks.alias("_nc"))
    return base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_nc") - 1),
                lambda i: F.slice(F.col("_t"), i * stride + 1, size),
            )
        ).alias("chunk_id", "_chunk"),
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * stride).alias("start_pos"),
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


def corpus_profile(documents: DataFrame) -> DataFrame:
    """ONE summary row profiling the whole corpus — the daily inspection
    query a data engineer runs before/after every pipeline stage:
    (n_docs, total_tokens, distinct_fingerprints, dup_fraction, n_langs,
    n_sources, mean_tokens, p50_chars).

    - dup_fraction: 1 − distinct canonical fingerprints / docs (the
      exact-dedup signal at zero extra cost);
    - p50_chars: exact integer median via the same value-histogram
      technique as :func:`length_quantile_keep` — no interpolation.

    Plan shape: one scan feeding map-side-combinable aggregates; the
    only window sits over the distinct-n_chars histogram. Single-row
    output: the cheapest possible driver round-trip at any corpus size.
    """
    from ..functions.text import canonical_fingerprint

    base = documents.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        canonical_fingerprint(F.col("text")).alias("_fp"),
    )
    hist = base.groupBy("n_chars").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        hist.select(
            "n_chars",
            F.sum("_c").over(w).alias("_cum"),
            F.sum("_c").over(Window.partitionBy()).alias("_n"),
        )
        .filter(F.col("_cum") >= F.ceil(F.col("_n") / 2))
        .agg(F.min("n_chars").alias("p50_chars"))
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("_fp").alias("distinct_fingerprints"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
    )
    return stats.crossJoin(gated_broadcast(med, "1-row global aggregate")).select(
        "n_docs",
        "total_tokens",
        "distinct_fingerprints",
        F.round(
            F.lit(1.0) - F.col("distinct_fingerprints") / F.col("n_docs"), 6
        ).alias("dup_fraction"),
        "n_langs",
        "n_sources",
        "mean_tokens",
        "p50_chars",
    )


def quality_deciles(
    documents: DataFrame, n_tiles: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, stopword_ratio, decile): NTILE-equivalent quality buckets
    over prose-ness (decile 1 = most stopword-dense = most prose-like),
    for quality-stratified corpus sampling. Total order (rounded ratio
    DESC, doc_id ASC) makes the tiles engine-independent.

    Computes exactly ``NTILE(n) OVER (ORDER BY ratio DESC, doc_id)``
    WITHOUT a corpus-sized unpartitioned window (VERDICT r4 item 2).
    ``stopword_ratio`` is rounded to 6dp, so its value histogram is
    bounded (≤1e6+1 rows, far fewer in practice). The global rank of a
    row is (rows with strictly larger ratio, from the histogram's
    cumulative count) + (rank by doc_id within its own ratio value, a
    PARTITIONED window). The tile then follows from the standard NTILE
    split — the first n%k buckets take ceil(n/k) rows, the rest
    floor(n/k) — as pure per-row arithmetic on the broadcast totals.

    Plan shape: one corpus scan → ratio; histogram aggregate (map-side
    combinable); the only unpartitioned windows run over the HISTOGRAM
    (the :func:`length_quantile_keep` discipline); histogram broadcast
    back; one window partitioned by ratio value for tie-splitting.
    """
    q = quality_scores(documents, id_col=id_col, text_col=text_col).select(
        "doc_id", "stopword_ratio"
    )
    hist = q.groupBy("stopword_ratio").agg(F.count(F.lit(1)).alias("_c"))
    before_w = Window.orderBy(F.desc("stopword_ratio")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "stopword_ratio",
        F.coalesce(F.sum("_c").over(before_w), F.lit(0)).alias("_before"),
        F.sum("_c").over(Window.partitionBy()).alias("_n"),
    )
    pv = Window.partitionBy("stopword_ratio").orderBy("doc_id")
    ranked = (
        q.join(gated_broadcast(cum, "value-histogram: one row per distinct 6dp value"), "stopword_ratio")
        .withColumn("_r", F.col("_before") + F.row_number().over(pv))
    )
    k = F.lit(n_tiles)
    base = F.floor(F.col("_n") / k)          # floor(n/k): small-bucket size
    rem = F.col("_n") % k                    # first `rem` buckets get +1
    big_rows = rem * (base + F.lit(1))       # rows covered by the big buckets
    tile = F.when(
        F.col("_r") <= big_rows,
        F.floor((F.col("_r") - 1) / (base + 1)) + 1,
    ).otherwise(
        # greatest() guards the never-taken branch when n < k (base = 0)
        rem + F.floor((F.col("_r") - big_rows - 1) / F.greatest(base, F.lit(1))) + 1
    )
    return ranked.select(
        "doc_id", "stopword_ratio", tile.cast("int").alias("decile")
    )


def dsir_scores(
    documents: DataFrame,
    target: DataFrame,
    num_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, log_weight): DSIR-style importance weights
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling", arXiv:2302.03169 — public): hashed unigram bucket
    counts, add-one-smoothed categorical bucket distributions for the
    TARGET domain vs the RAW corpus, per-document log importance weight
    Σ_b count_b · ln(p_target(b) / p_raw(b)), rounded 6dp. Selection
    (sample ∝ weight / keep top fraction) composes with the existing
    deterministic sampling operators; this op is the scoring kernel.

    Plan shape at 100 TB: two token explodes feeding bucket-count
    aggregates (map-side combinable, ≤ num_buckets output rows each);
    the log-ratio table is num_buckets rows — broadcast; per-(doc,
    bucket) counts shuffle once on doc_id; no windows, no skew (bucket
    join is a broadcast). Token totals ride a 1-row cross join.
    """
    raw_tok = _dsir_buckets(documents, num_buckets, id_col, text_col)
    ratio = dsir_log_ratio(documents, target, num_buckets, id_col, text_col)
    per_doc = raw_tok.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_doc.join(gated_broadcast(ratio, "fixed-size construction: num_buckets log-ratio rows"), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("log_weight"),
        )
    )


def _dsir_buckets(
    df: DataFrame, num_buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, b): hashed-unigram bucket stream (one row per token)."""
    from ..functions.text import md5_hash32
    from ..functions.text import tokens as _tokens

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    ).select("doc_id", F.pmod(md5_hash32(F.col("token")), F.lit(num_buckets)).alias("b"))


def dsir_log_ratio(
    documents: DataFrame,
    target: DataFrame,
    num_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(b, lr): the trained DSIR model — add-one-smoothed log ratio
    ln(p_target(b)/p_raw(b)) per hashed-unigram bucket. Emitted DENSE:
    exactly num_buckets rows, one per possible bucket, so a bucket unseen
    in BOTH corpora still carries its smoothed ratio ln((rn+B)/(tn+B))⁻¹-
    style value instead of being absent (ADVICE r5: the streaming scorer's
    inner join silently dropped tokens hashing to missing buckets,
    understating n_tokens/log_weight for genuinely novel documents).
    Still the broadcastable artifact both the batch scorer and
    streaming/events.py::dsir_score_stream consume."""
    B = num_buckets
    raw_tok = _dsir_buckets(documents, B, id_col, text_col)
    tgt_tok = _dsir_buckets(target, B, id_col, text_col)
    raw_hist = raw_tok.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tgt_hist = tgt_tok.groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    return dsir_log_ratio_from_hists(
        documents.sparkSession, raw_hist, tgt_hist, num_buckets
    )


def dsir_log_ratio_from_hists(
    spark: SparkSession,
    raw_hist: DataFrame,
    tgt_hist: DataFrame,
    num_buckets: int = 4096,
) -> DataFrame:
    """The DSIR ratio table from already-aggregated bucket histograms
    (raw: (b, rc); target: (b, tc)) — the consolidation face: bucket
    counts are ADDITIVE, so per-batch raw-corpus histograms appended by
    an ingest loop sum into exactly the whole-corpus histogram, and the
    model retrains after a batch for the cost of the BATCH's tokens plus
    a num_buckets-sized merge (never a corpus rescan). Totals are
    derived from the histograms themselves, keeping the two faces
    bit-identical."""
    B = num_buckets
    totals = raw_hist.agg(F.sum("rc").cast("long").alias("rn")).crossJoin(
        tgt_hist.agg(F.sum("tc").cast("long").alias("tn"))
    )
    # Dense bucket spine: B is bounded (default 4096), one driver-side
    # range() row per bucket — broadcast-sized by construction.
    spine = spark.range(B).select(F.col("id").cast("int").alias("b"))
    return (
        spine.join(raw_hist, "b", "left")
        .join(tgt_hist, "b", "left")
        .select(
            "b",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("tc", F.lit(0)).alias("tc"),
        )
        .crossJoin(gated_broadcast(totals, "1-row global aggregate"))
        .select(
            "b",
            (
                F.log((F.col("tc") + 1).cast("double") / (F.col("tn") + B))
                - F.log((F.col("rc") + 1).cast("double") / (F.col("rn") + B))
            ).alias("lr"),
        )
    )


def dsir_sample(
    documents: DataFrame,
    target: DataFrame,
    k: int = 100,
    num_buckets: int = 4096,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, log_weight, sample_key): DSIR selection — a Gumbel-top-k
    draw of ``k`` documents without replacement with probability ∝
    exp(log_weight), i.e. the importance-RESAMPLING half of Xie et al.
    2023. Log-space Efraimidis–Spirakis: the A-ES key −ln(u)/w equals
    exp(ln(−ln u) − ln w), so taking the k smallest of
    ``ln(−ln u) − log_weight`` is the identical sample with no exp()
    overflow at extreme weights. ``u`` is the deterministic md5 uniform
    of the sampling suite — the draw is a pure function of (doc_id,
    seed) and the ROUNDED 6dp log_weight, hence engine-independent.

    Plan shape: the DSIR scoring plan + a scan-resident key + ORDER BY
    LIMIT k (TakeOrdered — per-partition heaps, k-row driver merge).
    """
    from ..functions.text import md5_hash60

    scores = dsir_scores(documents, target, num_buckets, id_col, text_col)
    u = (md5_hash60(F.col("doc_id").cast("string"), seed) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(1 << 60))
    key = F.log(-F.log(u)) - F.col("log_weight")
    return (
        scores.select("doc_id", "log_weight", key.alias("_k"))
        .orderBy("_k", "doc_id")
        .limit(k)
        .select("doc_id", "log_weight", F.round("_k", 6).alias("sample_key"))
    )


def paragraph_language_profile(
    spark: SparkSession,
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_paras, majority_lang, lang_consistency, is_mixed):
    paragraph-granularity language profile — language_id run per
    paragraph unit, rolled up per document. Mixed-language documents
    (boilerplate in one language wrapping content in another, mid-doc
    language switches) are a standard multilingual-corpus cleaning
    target that document-level langid averages away; the profile flags
    them (``is_mixed``) with the majority language and its coverage
    fraction (ties by language code ascending, the langid contract).

    Plan: split_paragraphs' generate + the langid broadcast stopword
    join per paragraph + one per-doc rollup — everything keyed on the
    packed para_key / doc_id, no corpus-wide state."""
    from .dedup import split_paragraphs

    paras = split_paragraphs(documents, id_col, text_col)
    plang = language_id(
        spark,
        paras.select(F.col("para_key").alias("pk"), "text"),
        id_col="pk",
    ).withColumnRenamed("doc_id", "para_key")
    joined = paras.select("doc_id", "para_key").join(plang, "para_key")
    cnt = joined.groupBy("doc_id", "lang_guess").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("lang_guess"))
    maj = cnt.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    tot = joined.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_paras"))
    return tot.join(maj, "doc_id").select(
        "doc_id",
        "n_paras",
        F.col("lang_guess").alias("majority_lang"),
        F.round(F.col("c") / F.col("n_paras"), 6).alias("lang_consistency"),
        (F.col("c") < F.col("n_paras")).alias("is_mixed"),
    )


def c4_paragraph_clean(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped, n_sentences, keep_doc):
    the C4 line/page cleanup heuristics (Raffel et al., "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", JMLR 2020, §2.2), at blank-line paragraph granularity
    (the corpus's line unit — same deviation split_paragraphs documents):

    * a paragraph survives iff it ends in terminal punctuation
      (``. ! ? "``), carries ≥ ``min_words`` whitespace words, and does
      not mention "javascript" (case-insensitive);
    * the document survives (``keep_doc``) iff its CLEANED text still
      has ≥ ``min_sentences`` sentence terminators and the RAW text
      contains neither "lorem ipsum" nor a curly brace (the code/
      boilerplate page signals).

    Rows are returned for every input document with the flag rather
    than pre-filtered — callers pick the policy, and the stable row
    count keeps the operator hash-checkable. Everything is per-row
    array/string expressions inside codegen: one projection, no
    shuffle, no UDF — the 100 TB plan is the scan itself.
    """
    raw = F.col(text_col)
    paras = F.filter(
        F.transform(F.split(raw, "\n\n"), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    kept = F.filter(
        paras,
        lambda p: p.rlike('[.!?"]$')
        & (F.size(F.split(F.trim(F.regexp_replace(p, r"\s+", " ")), " ")) >= min_words)
        & (F.instr(F.lower(p), "javascript") == 0),
    )
    clean = F.concat_ws("\n\n", kept)
    n_sent = F.length(clean) - F.length(F.regexp_replace(clean, r"[.!?]", ""))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(paras) - F.size(kept)).cast("long").alias("n_dropped"),
        n_sent.cast("long").alias("n_sentences"),
        (
            (n_sent >= min_sentences)
            & (F.instr(F.lower(raw), "lorem ipsum") == 0)
            & (F.instr(raw, "{") == 0)
        ).alias("keep_doc"),
    )


def line_repetition_scores(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_lines, dup_line_fraction, dup_line_char_fraction): the
    LINE members of Gopher's intra-document repetition rule family (Rae
    et al. 2021, Appendix A) that repetition_scores' token/2-gram
    signals deliberately left out for want of newline structure —
    boilerplate navigation, headers and chat scaffolding repeat whole
    lines, which token-level fractions dilute:

    * dup_line_fraction — line positions whose (trimmed) line occurs
      more than once in the document, over all line positions (the same
      position-multiplicity convention as dup_2gram_fraction);
    * dup_line_char_fraction — characters of those positions over all
      line characters.

    Blank/whitespace-only lines are not lines. Plan shape: one generate
    (split + explode) → one (doc_id, line)-keyed count aggregate
    (map-side combinable, doc_id in the key — no hotspot) → one per-doc
    rollup. Linear in corpus characters, no joins.
    """
    lines = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("_l"),
        )
        .select("doc_id", F.trim(F.col("_l")).alias("line"))
        .filter(F.col("line") != "")
    )
    lc = lines.groupBy("doc_id", "line").agg(
        F.count(F.lit(1)).alias("c"), F.length("line").alias("len")
    )
    return lc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_lines"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c"),
            6,
        ).alias("dup_line_fraction"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("len")).otherwise(F.lit(0)))
            / F.sum(F.col("c") * F.col("len")),
            6,
        ).alias("dup_line_char_fraction"),
    )


def consolidate_token_counts(deltas: DataFrame) -> DataFrame:
    """Whole-corpus (token, count, n_docs) from a union/append of
    per-batch delta tables: counts are ADDITIVE and, for an
    append-only ingest where a document belongs to exactly one batch,
    so are per-token distinct-doc counts — one sum aggregate
    consolidates any number of batches. This is the algebra that makes
    vocabulary maintenance incremental: re-deriving the tokenizer table
    after a batch costs the BATCH's tokens plus a |vocab|-sized merge,
    never a corpus rescan. Tokens whose counts sum to zero (fully
    retracted — etl._negate) drop, so the consolidated table equals the
    direct count table over the surviving corpus."""
    return (
        deltas.groupBy("token")
        .agg(F.sum("count").alias("count"), F.sum("n_docs").alias("n_docs"))
        .filter(F.col("count") > 0)
    )


def lexical_diversity(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr, hapax_fraction): lexical-
    diversity signals — type-token ratio (distinct/total) and hapax
    fraction (types occurring once / types). Near-zero TTR marks
    keyword-stuffed or looping text that length/stop-word rules pass;
    near-one TTR on long docs marks word-salad. One (doc, token) count
    aggregate + one per-doc rollup; integer-derived ratios rounded 6dp."""
    tok = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tc = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("_c"))
    return tc.groupBy("doc_id").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("_c"), 6).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("hapax_fraction"),
    )


def zipf_fit(
    documents: DataFrame,
    top_k: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row (n_tokens_fit, slope, intercept): least-squares fit of
    ln(count) against ln(rank) over the top-``top_k`` vocabulary entries
    — the Zipf profile (natural language ≈ −1; a slope collapsing toward
    0 marks templated/generated text, a cliff marks truncated vocab).
    Ranks come from the SAME two-level vocabulary rank as the tokenizer
    (token_id + 1), so the fit is reproducible bit-for-bit against the
    SQL derivation up to the 6dp rounding of the closed-form sums.
    Everything after the vocab aggregate is top_k rows — driver-trivial,
    corpus-linear before it."""
    vocab = build_vocabulary(documents, id_col=id_col, text_col=text_col, max_size=top_k)
    pts = vocab.select(
        F.log(F.col("token_id").cast("double") + 1).alias("_x"),
        F.log(F.col("count").cast("double")).alias("_y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    slope = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    return agg.select(
        F.col("_n").cast("long").alias("n_tokens_fit"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("_sy") - slope * F.col("_sx")) / F.col("_n"), 6).alias(
            "intercept"
        ),
    )


def readability(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch, fk_grade):
    Flesch Reading Ease (Flesch 1948) and Flesch-Kincaid grade level
    (Kincaid et al. 1975) from rule-based integer counts — the classic
    pedagogical-difficulty axis of corpus quality filtering (complements
    the stopword/length signals in ``quality_signals``; RefinedWeb and
    FineWeb both report readability-style difficulty profiles).

    Counting rules, chosen so both engines agree bit-for-bit:
    - sentences: non-whitespace ``SENTENCE_RE`` runs over the RAW text —
      exactly the ``split_sentences`` convention;
    - words: non-empty whitespace tokens of the lowercased,
      whitespace-collapsed text;
    - syllables: per word, number of maximal vowel-group runs
      ``[aeiouy]+`` with a floor of 1 (the standard heuristic: every
      word carries at least one syllable).

    flesch   = 206.835 - 1.015·(W/S) - 84.6·(Y/W)
    fk_grade = 0.39·(W/S) + 11.8·(Y/W) - 15.59

    The ratios are double divisions of exact integers and the constant
    folds evaluate in the same literal order on both engines; outputs
    rounded 6dp. Rows with zero words or zero sentences are dropped
    (ratios undefined). Plan: one projection with higher-order
    aggregates — per-row JVM work, no shuffle."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    words = F.filter(F.split(norm, " "), lambda w: w != F.lit(""))
    syll = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ).cast("long"),
    )
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    counted = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("long").alias("n_words"),
        F.size(sents).cast("long").alias("n_sentences"),
        syll.alias("n_syllables"),
    ).where((F.col("n_words") > 0) & (F.col("n_sentences") > 0))
    wps = F.col("n_words") / F.col("n_sentences")
    ypw = F.col("n_syllables") / F.col("n_words")
    return counted.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * ypw, 6).alias(
            "flesch"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * ypw - F.lit(15.59), 6).alias(
            "fk_grade"
        ),
    )


def min_k_prob_scores(
    documents: DataFrame,
    k_pct: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Min-K% Prob (Shi et al. 2023, "Detecting Pretraining Data from
    Large Language Models"): per document, the mean of the k% LOWEST
    per-position log-probabilities under the corpus model — here the same
    char-bigram CCNet-proxy LM as ``lm_bigram_scores``. The signal: text
    the model has effectively memorized has no low-probability outlier
    positions, so even its bottom-k% mass scores high; genuinely novel
    text always carries a heavy low-probability tail. Used to audit a
    corpus for benchmark/eval contamination *without* n-gram matching
    (complements ``decontaminate``'s exact-gram half).

    (doc_id, n_bigrams, n_lowest, min_k_score): n_lowest =
    ceil(n_bigrams·k/100) via exact integer arithmetic ((n·k + 99) DIV
    100 — no float ceil, both engines identical); min_k_score rounded
    6dp. Tie positions at the selection boundary carry EQUAL log-probs,
    so the selected multiset sum is deterministic regardless of which
    tied instance ranks inside.

    Plan shape: the bounded |charset|² model broadcasts onto the bigram
    stream; ranking windows partition per doc (bounded by document
    length, never corpus-wide). The corpus is normalized+exploded ONCE
    (round 10): both the model and the ranked stream derive from the
    pinned per-(doc, bigram) count table — the position stream the
    ranking window needs is reconstructed from the counts with an integer
    sequence-explode, which is exact because positions of the same
    (doc, bigram) carry equal log-probs, so the selected bottom-k%
    multiset (and hence every output value) is unchanged."""
    from ..plans import materialize

    dc = materialize(_doc_bigram_counts(documents, id_col, text_col))
    big = materialize(dc.groupBy("bigram").agg(F.sum("_c").alias("_cnt")))
    pre = big.groupBy(F.substring("bigram", 1, 1).alias("_c1")).agg(
        F.sum("_cnt").alias("_tot")
    )
    model = big.join(
        gated_broadcast(pre, "character-domain aggregate: one row per leading char, bounded by the charset"), F.substring(big["bigram"], 1, 1) == pre["_c1"]
    ).select("bigram", (F.log2(F.col("_cnt") / F.col("_tot"))).alias("_lp"))
    grams = dc.select(
        "doc_id",
        "bigram",
        F.explode(F.sequence(F.lit(1), F.col("_c"))).alias("_pos"),
    ).select("doc_id", "bigram")
    w_doc = Window.partitionBy("doc_id")
    w_rnk = Window.partitionBy("doc_id").orderBy("_lp", "bigram")
    ranked = (
        grams.join(gated_broadcast(model, "character-bigram model: bounded by |charset|^2 rows"), "bigram")
        .withColumn("_r", F.row_number().over(w_rnk))
        .withColumn("_n", F.count(F.lit(1)).over(w_doc))
    )
    return (
        ranked.where(F.col("_r") <= F.expr(f"(_n * {int(k_pct)} + 99) DIV 100"))
        .groupBy("doc_id")
        .agg(
            F.max("_n").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_lowest"),
            F.round(F.avg("_lp"), 6).alias("min_k_score"),
        )
    )


def source_js_divergence(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_common_tokens, js_divergence): pairwise
    Jensen-Shannon divergence (log2, so ∈ [0,1]) between the unigram
    token distributions of every source pair — the similarity structure
    behind mixture design (near-duplicate sources waste mixture weight;
    an outlier source needs its own temperature/cap — the measurement
    feeding ``mix_corpus``/``unimax_budgets``) and the pairwise twin of
    the one-vs-baseline KL in ``quality_drift``.

    Never materializes the union of two vocabularies: with P, Q the two
    distributions, every token outside the support intersection
    contributes exactly p/2 (q/2) to JS because log2(2p/(p+0)) = 1, so

      JS(P,Q) = Σ_common [p/2·log2(2p/(p+q)) + q/2·log2(2q/(p+q))]
                + (1 − Σ_common p)/2 + (1 − Σ_common q)/2

    — one equi-join on token (per-token fanout bounded by |sources|²),
    one |sources|²-row aggregate. No smoothing needed: JS is finite on
    disjoint support (where it reaches exactly 1).

    DOCUMENTED OMISSION (round-7 ADVICE): source pairs sharing ZERO
    tokens produce no row at all (the inner join on token has nothing
    to aggregate), rather than an explicit (a, b, 0, 1.0) row — a
    missing row here means "fully disjoint vocabularies (JS = 1)", not
    "unmeasured". Mixture-design consumers that need the dense matrix
    should left-join this output onto the |sources|² pair grid and
    coalesce to (n_common_tokens=0, js_divergence=1.0). Kept as-is
    (matching the oracle) so the attested contract is stable; both
    engines agree on the omission."""
    tok = documents.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    counts = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("_c"))
    totals = counts.groupBy("source").agg(F.sum("_c").alias("_tot"))
    dist = counts.join(gated_broadcast(totals, "|sources| rows: the source taxonomy is data-model bounded"), "source").select(
        "source", "token", (F.col("_c") / F.col("_tot")).alias("_p")
    )
    a = dist.select(
        F.col("source").alias("source_a"), "token", F.col("_p").alias("_pa")
    )
    b = dist.select(
        F.col("source").alias("source_b"), "token", F.col("_p").alias("_pb")
    )
    common = a.join(b, "token").where(F.col("source_a") < F.col("source_b"))
    term = (
        F.col("_pa") / 2 * F.log2(2 * F.col("_pa") / (F.col("_pa") + F.col("_pb")))
        + F.col("_pb") / 2 * F.log2(2 * F.col("_pb") / (F.col("_pa") + F.col("_pb")))
    )
    return common.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_common_tokens"),
        F.round(
            F.sum(term)
            + (F.lit(1.0) - F.sum("_pa")) / 2
            + (F.lit(1.0) - F.sum("_pb")) / 2,
            6,
        ).alias("js_divergence"),
    )


def encoding_noise_scores(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_replacement, n_control, n_mojibake,
    noise_ratio): encoding-damage signals — the cleanup filter every
    web-scrape pipeline runs before tokenization (CCNet/C4 both drop
    encoding-broken pages):

    - n_replacement: U+FFFD replacement characters (decode failures);
    - n_control: C0/C1 control characters other than tab/newline/CR
      (binary junk that survived extraction);
    - n_mojibake: double-encoded UTF-8 artifacts — 'Ã'/'Â' followed by
      a Latin-1 supplement char, the classic utf8-read-as-latin1
      signature ('é' → 'Ã©');
    - noise_ratio: (replacement + control + mojibake) / chars, 6dp.

    All four counts are regexp_extract_all lengths over the RAW text —
    per-row JVM work, no shuffle; both engines use RE2-safe character
    classes."""
    n_chars = F.char_length(F.col(text_col))

    def _count(pat: str):
        return F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).cast("long")

    n_repl = _count(r"�")
    n_ctrl = _count(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]")
    n_moji = _count(r"[ÂÃ][ -ÿ]")
    total = n_repl + n_ctrl + n_moji
    return documents.where(n_chars > 0).select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        n_moji.alias("n_mojibake"),
        F.round(total / n_chars, 6).alias("noise_ratio"),
    )


def _percentile_rank(scored: DataFrame, value_col: str, out_col: str) -> DataFrame:
    """scored + ``out_col``: exact empirical percentile rank (cume_dist
    semantics — fraction of rows with value <= this row's) computed via
    the distinct-VALUE histogram + its bounded cumulative window and a
    join back, never a corpus-row-sized window. Integer/integer ratio,
    6dp."""
    hist = scored.groupBy(value_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("_cum", F.sum("_n").over(w))
    total = hist.agg(F.sum("_n").alias("_tot"))
    ranks = cum.crossJoin(gated_broadcast(total, "1-row global aggregate")).select(
        value_col, F.round(F.col("_cum") / F.col("_tot"), 6).alias(out_col)
    )
    return scored.join(gated_broadcast(ranks, "value-histogram: one row per distinct 6dp value"), value_col)


def quality_percentile_fusion(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pr_stopword, pr_lm, pr_lexical, fused_score): three
    higher-is-better quality signals — stopword ratio, LM-bigram
    typicality, type-token ratio — each mapped to its exact empirical
    percentile rank, then averaged. Rank-space fusion is the filter-side
    analog of reciprocal-rank fusion: incommensurable signals (a ratio,
    a log-probability, a diversity index) become combinable without
    per-signal scaling folklore, and the fused score is uniform-ish by
    construction so one global keep-fraction threshold does what it
    says.

    Only documents carrying ALL three signals appear (inner joins; docs
    under 2 chars have no LM score by that operator's contract).

    Plan: three bounded distinct-value histograms with their cumulative
    windows (the sanctioned two-level pattern — never a corpus-row
    window), broadcast rank tables joined back, one final projection."""
    sw = quality_scores(documents, id_col, text_col).select(
        "doc_id", F.col("stopword_ratio").alias("_sw")
    )
    lm = lm_bigram_scores(documents, id_col, text_col).select(
        "doc_id", F.col("lm_score").alias("_lm")
    )
    lex = lexical_diversity(documents, id_col, text_col).select(
        "doc_id", F.col("ttr").alias("_lex")
    )
    joined = sw.join(lm, "doc_id").join(lex, "doc_id")
    ranked = _percentile_rank(
        _percentile_rank(
            _percentile_rank(joined, "_sw", "pr_stopword"), "_lm", "pr_lm"
        ),
        "_lex",
        "pr_lexical",
    )
    return ranked.select(
        "doc_id",
        "pr_stopword",
        "pr_lm",
        "pr_lexical",
        F.round(
            (F.col("pr_stopword") + F.col("pr_lm") + F.col("pr_lexical")) / 3, 6
        ).alias("fused_score"),
    )


def _midrank(scored: DataFrame, value_col: str, out_col: str) -> DataFrame:
    """scored + ``out_col``: the average (mid) rank of each row's value —
    ties share the mean of the positions they occupy, the exact rank
    convention Spearman's ρ requires. Built from the distinct-value
    histogram (cum_before + (count+1)/2) + a broadcast join back —
    never a corpus-row window."""
    hist = scored.groupBy(value_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
    ranks = hist.withColumn(
        "_cum", F.coalesce(F.sum("_n").over(w), F.lit(0))
    ).select(
        value_col,
        (F.col("_cum") + (F.col("_n") + 1) / 2.0).alias(out_col),
    )
    return scored.join(gated_broadcast(ranks, "value-histogram: one row per distinct 6dp value"), value_col)


def signal_correlations(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(signal_a, signal_b, pearson, spearman): the pairwise dependence
    structure of the three fused quality signals (stopword ratio,
    LM-bigram typicality, type-token ratio) — the check that fusion
    (``quality_percentile_fusion``) and multi-signal filters actually
    add information: two signals correlating at ρ≈1 are one signal
    charged twice; Pearson≫Spearman gaps flag outlier-driven linear
    correlation.

    Pearson via the ``corr`` aggregate (the oracle-green precedent from
    the graph summary's assortativity); Spearman = Pearson on exact
    midranks (ties share their mean position, built from bounded
    distinct-value histograms). Both rounded 6dp; 3 rows."""
    sw = quality_scores(documents, id_col, text_col).select(
        "doc_id", F.col("stopword_ratio").alias("sw")
    )
    lm = lm_bigram_scores(documents, id_col, text_col).select(
        "doc_id", F.col("lm_score").alias("lm")
    )
    lex = lexical_diversity(documents, id_col, text_col).select(
        "doc_id", F.col("ttr").alias("lex")
    )
    joined = sw.join(lm, "doc_id").join(lex, "doc_id")
    ranked = _midrank(
        _midrank(_midrank(joined, "sw", "_rsw"), "lm", "_rlm"), "lex", "_rlex"
    )
    pairs = [("sw", "lm"), ("sw", "lex"), ("lm", "lex")]
    out = None
    for a, b in pairs:
        row = ranked.agg(
            F.round(F.corr(a, b), 6).alias("pearson"),
            F.round(F.corr(f"_r{a}", f"_r{b}"), 6).alias("spearman"),
        ).select(
            F.lit(a).alias("signal_a"), F.lit(b).alias("signal_b"), "pearson", "spearman"
        )
        out = row if out is None else out.unionByName(row)
    return out


def source_signatures(
    documents: DataFrame,
    top_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, token, tfidf): each source's ``top_n`` most DISTINCTIVE
    tokens — term frequency within the source × ln(|sources| /
    source-document-frequency), i.e. tf-idf lifted from the document
    grain to the source grain. The quick "what is actually in this
    feed" answer behind mixture decisions and drift triage (a source
    whose signature flips is a source whose upstream changed).

    Ties broken by token ascending; tokens present in every source get
    idf 0 and drop out by construction.

    Plan (round-7 VERDICT item 4): the per-token source-document-
    frequency table ``sdf`` is VOCABULARY-sized — unbounded at corpus
    scale — so it is NEVER broadcast; tf⋈sdf is a plain shuffle join on
    token (both sides come pre-partitioned by token out of their
    aggregates, so AQE usually elides the second exchange). Only the
    genuinely |sources|-bounded frames (per-source totals, the source
    count) ship as broadcasts. The per-source top-k is TWO-LEVEL: the
    window partitions by (source, token-hash-bucket) — vocab-sized
    input split across NUM_SIG_BUCKETS·|sources| tasks — and the final
    window re-ranks only the surviving |sources|·buckets·top_n rows,
    so no single task ever sorts a source's whole vocabulary."""
    tok = documents.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("_tf"))
    tot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("_tot"))
    sdf = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_sdf"))
    ns = tot.agg(F.count(F.lit(1)).alias("_ns"))
    scored = (
        tf.join(gated_broadcast(tot, "|sources| rows: the source taxonomy is data-model bounded"), "source")
        .join(sdf, "token")
        .crossJoin(gated_broadcast(ns, "1-row global aggregate"))
        .select(
            "source",
            "token",
            F.round(
                (F.col("_tf") / F.col("_tot"))
                * F.log(F.col("_ns") / F.col("_sdf")),
                6,
            ).alias("tfidf"),
        )
    )
    num_buckets = 64
    w_local = Window.partitionBy("source", "_bkt").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    local = (
        scored.withColumn("_bkt", F.pmod(F.hash("token"), F.lit(num_buckets)))
        .withColumn("_rn", F.row_number().over(w_local))
        .where(F.col("_rn") <= top_n)
        .drop("_rn", "_bkt")
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_n)
        .drop("_rn")
    )
