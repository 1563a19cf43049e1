"""Driver-contract registry: query name -> (spark_fn, oracle_sql).

Every entry pairs the DataFrame-API implementation (engine side) with an
ANSI-SQL twin DuckDB runs on the same parquet tables. Names, aliases and
rounding are kept identical on both sides — the driver hash-compares values
after sorting columns by name (see repo __spark_entry__.py docstring).

Shared determinism rules (SURVEY.md §5, DESIGN.md):
- float similarity/avg outputs rounded to 6 decimals on both sides;
- every ORDER BY ... LIMIT carries a unique tie-break key;
- vector math in double precision, sequential accumulation.

Parameter bindings for the registered (parameterless) queries:
- target user id = 1 (exists at every scale factor);
- KNN: topK=20 like the reference call site (Alg_KNN_FastRP.py:158), but
  cutoff=0.2 instead of 0.8 — the driver's synthetic embeddings are
  near-random (max pairwise cosine ~0.51), so the reference cutoff would
  produce the empty graph. The API default remains 0.8.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import corating, etl, knn, recommend, serving
from .sources.views import (
    ORACLE_PRELUDE,
    build_users,
    load_ref_tables,
    oracle,
)

UID = 1
KNN_TOPK = 20
KNN_CUTOFF = 0.2

# --- shared Spark-side derived inputs -------------------------------------


def user_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver ``embeddings`` restricted to ids that are actual users —
    vec_id plays the role of User.id carrying the embedding property
    (reference Alg_KNN_FastRP.py:63-65). At sf<0.01 some vec_ids exceed the
    user id range; the semi-join drops them on both engines."""
    ref = load_ref_tables(spark, sf_dir)
    return ref.embeddings.join(
        ref.users.select(F.col("user_id").alias("vec_id")), "vec_id", "left_semi"
    )


def similar_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SIMILAR_TO write-back table (reference Alg_KNN_FastRP.py:99-116)
    computed from the driver embeddings with the exact KNN operator.

    ``cache()`` = the reference's GDS write-back: the KNN graph is
    materialized once per session and the four serving queries that read it
    (topk / recommend / similar_users / graph_data) hit the stored table —
    Spark's plan-keyed cache makes every structurally identical call
    resolve to the same InMemoryRelation, so the O(n²) kernel runs once.
    """
    return knn.knn_exact(
        user_embeddings(spark, sf_dir), top_k=KNN_TOPK, cutoff=KNN_CUTOFF
    ).cache()


def users_with_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in community binding for the oracle-checked
    community-recommender queries: community := c_nationkey. The *real*
    pipeline binds plans/lpa.py output instead (rows-only checked queries,
    q_lpa_* below) — community ids from label propagation are partition-
    stable but not value-stable, so they can't be hash-compared to SQL."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # cached for the same write-back reason as similar_to(): the community
    # property is precomputed once, three serving queries read it
    return build_users(customer).join(
        customer.select(F.col("c_custkey").alias("user_id"), F.col("c_nationkey").alias("community")),
        "user_id",
    ).cache()


# --- oracle CTE fragments ---------------------------------------------------

USERS_COMM_SQL = """
SELECT c_custkey AS user_id,
       c_mktsegment AS location,
       CASE WHEN c_acctbal < 0 THEN NULL
            ELSE CAST(FLOOR(c_acctbal) AS INT) % 80 + 18 END AS age,
       c_nationkey AS community
FROM customer
""".strip()

# KNN over user embeddings: dot/norm in double, rounded to 6 decimals,
# cutoff then per-src row_number top-k with dst tie-break — mirrors
# operators/knn.py::knn_exact exactly.
SIMILAR_TO_CTES = f"""
vec AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  WHERE vec_id IN (SELECT user_id FROM users)
),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         ROUND(SUM(a.v[t.i] * b.v[t.i])
               / (SQRT(SUM(a.v[t.i] * a.v[t.i])) * SQRT(SUM(b.v[t.i] * b.v[t.i]))),
               6) AS similarity
  FROM vec a, vec b, range(1, 65) t(i)
  WHERE a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
similar_to AS (
  SELECT src, dst, similarity
  FROM (SELECT src, dst, similarity,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY similarity DESC, dst) AS rn
        FROM pairs WHERE similarity >= {KNN_CUTOFF})
  WHERE rn <= {KNN_TOPK}
)
""".strip()


def _q(sql: str) -> str:
    """Oracle query with the reference-view prelude."""
    return oracle(sql)


def _q_knn(sql: str) -> str:
    """Oracle query that additionally needs the similar_to CTEs."""
    return f"{ORACLE_PRELUDE},\n{SIMILAR_TO_CTES}\n{sql.strip()}"


def _q_comm(sql: str) -> str:
    """Oracle query that additionally needs the stand-in community CTE."""
    return f"{ORACLE_PRELUDE},\nuc AS ({USERS_COMM_SQL}),\ntc AS (SELECT community FROM uc WHERE user_id = {UID})\n{sql.strip()}"


# --- query registry ---------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]


def _ref(spark: SparkSession, sf_dir: str):
    return load_ref_tables(spark, sf_dir)


QUERIES: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle_sql: str | None) -> None:
    QUERIES[name] = (fn, oracle_sql)


# ETL (SURVEY §2.1/§2.2: P1, J5, J9, S6)
register(
    "q_etl_filter_ratings",
    lambda s, d: etl.filter_implicit_ratings(_ref(s, d).raw_ratings),
    _q("SELECT user_id, isbn, rating FROM raw_ratings WHERE rating <> 0"),
)
register(
    "q_etl_semijoin_users",
    lambda s, d: etl.semijoin_users(_ref(s, d).users, _ref(s, d).ratings),
    _q(
        """
        SELECT u.user_id, u.location, u.age FROM users u
        WHERE EXISTS (SELECT 1 FROM ratings r WHERE r.user_id = u.user_id)
        """
    ),
)
register(
    "q_etl_semijoin_books",
    lambda s, d: etl.semijoin_books(_ref(s, d).books, _ref(s, d).ratings),
    _q(
        """
        SELECT b.isbn, b.title, b.author, b.year, b.publisher FROM books b
        WHERE EXISTS (SELECT 1 FROM ratings r WHERE r.isbn = b.isbn)
        """
    ),
)
register(
    "q_fk_enforced_edges",
    lambda s, d: etl.fk_enforced_ratings(
        _ref(s, d).ratings, _ref(s, d).users, _ref(s, d).books
    ),
    _q(
        """
        SELECT r.user_id, r.isbn, r.rating
        FROM ratings r
        JOIN users u ON r.user_id = u.user_id
        JOIN books b ON r.isbn = b.isbn
        """
    ),
)
register(
    "q_unique_key_violations",
    lambda s, d: etl.duplicate_keys(_ref(s, d).ratings, ["user_id", "isbn"]),
    _q(
        """
        SELECT user_id, isbn, COUNT(*) AS count FROM ratings
        GROUP BY user_id, isbn HAVING COUNT(*) > 1
        """
    ),
)

# Serving: rated books (P4+J1+T3)
register(
    "q_rated_books",
    lambda s, d: serving.rated_books(_ref(s, d).ratings, _ref(s, d).books, UID),
    _q(
        f"""
        SELECT b.title, b.author, r.rating
        FROM ratings r JOIN books b ON r.isbn = b.isbn
        WHERE r.user_id = {UID}
        """
    ),
)

# Co-rating projection (J3+A1, the Louvain input graph). Cached: this is
# the reference's materialized Cypher graph projection
# (Alg_Community_Detection.py:15-34) — q_louvain_communities reads the
# same plan and resolves to the InMemoryRelation.
register(
    "q_corating_projection",
    lambda s, d: corating.corating_edges(_ref(s, d).ratings).cache(),
    _q(
        """
        SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS weight
        FROM (SELECT user_id, isbn FROM ratings WHERE rating >= 6) a
        JOIN (SELECT user_id, isbn FROM ratings WHERE rating >= 6) b USING (isbn)
        WHERE a.user_id <> b.user_id
        GROUP BY a.user_id, b.user_id
        """
    ),
)

# KNN similarity graph (J8) and its serving queries
register(
    "q_knn_topk",
    lambda s, d: similar_to(s, d),
    _q_knn("SELECT src, dst, similarity FROM similar_to"),
)
register(
    "q_knn_recommend",
    lambda s, d: recommend.recommend_books_knn(
        similar_to(s, d), _ref(s, d).ratings, _ref(s, d).books, UID, k=3
    ),
    _q_knn(
        f"""
        SELECT title, author, avgRating, votes FROM (
          SELECT b.isbn, b.title, b.author,
                 ROUND(AVG(r.rating), 6) AS avgRating, COUNT(*) AS votes
          FROM (SELECT dst FROM similar_to WHERE src = {UID}) st
          JOIN ratings r ON r.user_id = st.dst
          JOIN books b ON b.isbn = r.isbn
          WHERE NOT EXISTS (SELECT 1 FROM ratings t WHERE t.user_id = {UID} AND t.isbn = r.isbn)
          GROUP BY b.isbn, b.title, b.author
        ) ORDER BY avgRating DESC, votes DESC, isbn LIMIT 3
        """
    ),
)
register(
    "q_knn_similar_users",
    lambda s, d: recommend.similar_users_knn(similar_to(s, d), _ref(s, d).users, UID, k=3),
    _q_knn(
        f"""
        SELECT u.user_id AS userId, u.location, u.age
        FROM (SELECT dst FROM (
                SELECT dst, ROW_NUMBER() OVER (ORDER BY similarity DESC, dst) AS rn
                FROM similar_to WHERE src = {UID} AND dst <> {UID}) WHERE rn <= 3) s
        JOIN users u ON u.user_id = s.dst
        ORDER BY userId
        """
    ),
)
register(
    "q_knn_graph_data",
    lambda s, d: recommend.graph_data_knn(
        similar_to(s, d), _ref(s, d).ratings, _ref(s, d).books, UID
    ),
    _q_knn(
        f"""
        , t_books AS (
            SELECT r.isbn AS t_isbn, b.title AS t_title, r.rating AS t_rating
            FROM ratings r JOIN books b ON b.isbn = r.isbn WHERE r.user_id = {UID}),
        sim AS (SELECT dst AS sim_id, similarity FROM similar_to WHERE src = {UID}),
        s_books AS (
            SELECT r.user_id AS sim_id, r.isbn AS s_isbn, b.title AS s_title, r.rating AS s_rating
            FROM ratings r JOIN books b ON b.isbn = r.isbn)
        SELECT t.target_id, tb.t_isbn, tb.t_title, tb.t_rating,
               s.sim_id, s.similarity, sb.s_isbn, sb.s_title, sb.s_rating
        FROM (SELECT CAST({UID} AS BIGINT) AS target_id) t
        LEFT JOIN t_books tb ON TRUE
        LEFT JOIN sim s ON TRUE
        LEFT JOIN s_books sb ON sb.sim_id = s.sim_id
        """
    ),
)

# Community recommender over the deterministic stand-in community binding
register(
    "q_comm_recommend",
    lambda s, d: recommend.recommend_books_community(
        users_with_community(s, d), _ref(s, d).ratings, _ref(s, d).books, UID, k=3
    ),
    _q_comm(
        f"""
        SELECT title, author, recommendCount FROM (
          SELECT b.title, b.author, COUNT(*) AS recommendCount
          FROM ratings r
          JOIN (SELECT user_id FROM uc
                WHERE community IN (SELECT community FROM tc) AND user_id <> {UID}) p
            ON r.user_id = p.user_id
          JOIN books b ON b.isbn = r.isbn
          WHERE r.rating >= 6
            AND NOT EXISTS (SELECT 1 FROM ratings t WHERE t.user_id = {UID} AND t.isbn = r.isbn)
          GROUP BY b.title, b.author
        ) ORDER BY recommendCount DESC, title, author LIMIT 3
        """
    ),
)
register(
    "q_comm_similar_users",
    lambda s, d: recommend.similar_users_community(users_with_community(s, d), UID, k=3),
    _q_comm(
        f"""
        SELECT user_id AS userId, location, age FROM uc
        WHERE community IN (SELECT community FROM tc) AND user_id <> {UID}
        ORDER BY userId LIMIT 3
        """
    ),
)
register(
    "q_comm_graph_data",
    lambda s, d: recommend.graph_data_community(
        users_with_community(s, d), _ref(s, d).ratings, _ref(s, d).books, UID
    ),
    _q_comm(
        """
        SELECT u.user_id AS userId, u.location, u.age, r.isbn, b.title, b.author, r.rating
        FROM uc u
        JOIN ratings r ON r.user_id = u.user_id
        JOIN books b ON b.isbn = r.isbn
        WHERE u.community IN (SELECT community FROM tc)
        """
    ),
)
register(
    "q_community_members",
    lambda s, d: serving.community_members(users_with_community(s, d)),
    _q_comm(
        """
        SELECT communityId, userId, size FROM (
          SELECT community AS communityId, user_id AS userId,
                 COUNT(*) OVER (PARTITION BY community) AS size
          FROM uc WHERE community IS NOT NULL
        ) WHERE size >= 2
        """
    ),
)


# --- training-data pipeline extensions (dedup / text / simsearch / ---------
# --- multimodal / events) ---------------------------------------------------

from .functions.text import STOPWORDS  # noqa: E402
from .operators import dedup, events, multimodal, packing, sampling, simsearch, textstats  # noqa: E402

# Shared oracle CTEs over documents: normalized text, tokens, 3-gram shingles
# — each mirrors functions/text.py expression-for-expression.
DOCS_CTES = r"""
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
toks AS (SELECT doc_id, string_split(norm, ' ') AS t FROM norm),
sh AS (
  SELECT doc_id, unnest(s) AS shingle FROM (
    SELECT doc_id,
           list_distinct([array_to_string(list_slice(t, i, i + 2), ' ')
                          for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS s
    FROM toks)
)
""".strip()

VEC_CTE = """
vec AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
""".strip()


def _q_docs(sql: str) -> str:
    return f"WITH {DOCS_CTES}\n{sql.strip()}"


def _q_vec(sql: str) -> str:
    return f"WITH {VEC_CTE}\n{sql.strip()}"


def _docs(s: SparkSession, d: str) -> DataFrame:
    return _ref(s, d).documents


register(
    "q_dedup_exact",
    lambda s, d: dedup.dedup_exact(_docs(s, d)),
    """
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups, md5(text) AS fingerprint
    FROM documents GROUP BY text
    """,
)
register(
    "q_dedup_fingerprint",
    lambda s, d: dedup.dedup_fingerprint(_docs(s, d)),
    _q_docs(
        """
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS group_size, fingerprint FROM (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' ')) AS fingerprint
          FROM norm)
        GROUP BY fingerprint
        """
    ),
)
register(
    "q_dedup_repeated_ngrams",
    lambda s, d: dedup.repeated_ngrams(_docs(s, d), n=8),
    _q_docs(
        """
        , grams AS (
          SELECT doc_id,
                 unnest([array_to_string(list_slice(t, i, i + 7), ' ')
                         for i in range(1, greatest(len(t) - 7, 1) + 1)]) AS gram
          FROM toks)
        SELECT md5(gram) AS ngram_hash,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences
        FROM grams GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
        """
    ),
)
register(
    "q_dedup_span_removal",
    lambda s, d: dedup.remove_repeated_spans(_docs(s, d), n=8, min_docs=2),
    _q_docs(
        """
        , tokp AS (
          SELECT doc_id, u['pos'] AS pos, u['tok'] AS tok
          FROM (SELECT doc_id,
                       unnest([{'pos': i - 1, 'tok': t[i]}
                               for i in range(1, len(t) + 1)]) AS u
                FROM toks)),
        gr AS (
          SELECT doc_id, u['start'] AS start, u['h'] AS h
          FROM (SELECT doc_id,
                       unnest([{'start': i - 1,
                                'h': md5(array_to_string(list_slice(t, i, i + 7), ' '))}
                               for i in range(1, greatest(len(t) - 7, 1) + 1)]) AS u
                FROM toks)),
        bad AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd
                               FROM gr GROUP BY h) WHERE nd >= 2),
        cov AS (SELECT DISTINCT g.doc_id, g.start + r.i AS pos
                FROM gr g JOIN bad USING (h), range(0, 8) r(i)),
        kept AS (SELECT t.doc_id, t.pos, t.tok
                 FROM tokp t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
                 WHERE c.doc_id IS NULL),
        reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                       COUNT(*) AS n_kept FROM kept GROUP BY doc_id)
        SELECT nm.doc_id, COALESCE(r.clean_text, '') AS clean_text,
               CAST(len(string_split(nm.norm, ' ')) - COALESCE(r.n_kept, 0) AS BIGINT)
                 AS n_removed_tokens
        FROM norm nm LEFT JOIN reb r USING (doc_id)
        """
    ),
)
register(
    "q_dedup_ngram_jaccard",
    # cap=None: the oracle twin is the fully exact kernel (the scale
    # default caps per-shingle doc frequency at 1000 — see dedup.py)
    lambda s, d: dedup.ngram_jaccard_pairs(
        _docs(s, d), n=3, threshold=0.5, max_docs_per_shingle=None
    ),
    _q_docs(
        """
        , sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT doc_a, doc_b,
                 ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b)
        WHERE jaccard >= 0.5
        """
    ),
)
register(
    "q_dedup_containment",
    # cap=None: the oracle twin is the fully exact kernel (scale default
    # caps per-shingle doc frequency; see containment_pairs docstring)
    lambda s, d: dedup.containment_pairs(
        _docs(s, d), n=3, threshold=0.6, max_docs_per_shingle=None
    ),
    _q_docs(
        """
        , sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, containment FROM (
          SELECT doc_a, doc_b,
                 ROUND(CAST(i AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) AS containment
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b)
        WHERE containment >= 0.6
        """
    ),
)


_MINHASH_COEF_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, a, b in dedup.minhash_coefficients(32)
)

register(
    "q_dedup_minhash_lsh",
    lambda s, d: dedup.minhash_lsh_pairs(
        _docs(s, d), num_hashes=32, bands=8, shingle_n=3, threshold=0.5
    ),
    _q_docs(
        f"""
        , coef(seed, a, b) AS (VALUES {_MINHASH_COEF_VALUES}),
        base AS (
          SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
          FROM sh),
        sig AS (
          SELECT doc_id, seed, MIN((a * h + b) % {dedup.MINHASH_PRIME}) AS mh
          FROM base CROSS JOIN coef
          GROUP BY doc_id, seed),
        bands AS (
          SELECT doc_id, seed // 4 AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
          FROM sig GROUP BY doc_id, seed // 4),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        est AS (
          SELECT c.doc_a, c.doc_b,
                 ROUND(AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS est_jaccard
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.doc_a
          JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
        """
    ),
)
# The corpus-scale composition (VERDICT r1 item 3): LSH candidates -> exact
# verify. Same coef/sig/band CTEs as q_dedup_minhash_lsh (no est threshold),
# then the exact-Jaccard kernel restricted to candidate pairs.
register(
    "q_dedup_lsh_verified",
    lambda s, d: dedup.neardup_lsh_verified(
        _docs(s, d), num_hashes=32, bands=8, shingle_n=3, threshold=0.5
    ),
    _q_docs(
        f"""
        , coef(seed, a, b) AS (VALUES {_MINHASH_COEF_VALUES}),
        base AS (
          SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
          FROM sh),
        sig AS (
          SELECT doc_id, seed, MIN((a * h + b) % {dedup.MINHASH_PRIME}) AS mh
          FROM base CROSS JOIN coef
          GROUP BY doc_id, seed),
        bands AS (
          SELECT doc_id, seed // 4 AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
          FROM sig GROUP BY doc_id, seed // 4),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        est AS (
          SELECT c.doc_a, c.doc_b,
                 ROUND(AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS est_jaccard
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.doc_a
          JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
          GROUP BY 1, 2),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, COUNT(*) AS i
          FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
          GROUP BY 1, 2),
        verified AS (
          SELECT doc_a, doc_b, jaccard FROM (
            SELECT doc_a, doc_b,
                   ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b)
          WHERE jaccard >= 0.5)
        SELECT v.doc_a, v.doc_b, e.est_jaccard, v.jaccard
        FROM verified v JOIN est e ON e.doc_a = v.doc_a AND e.doc_b = v.doc_b
        """
    ),
)
register(
    "q_dedup_simhash",
    lambda s, d: dedup.simhash_signatures(_docs(s, d)),
    _q_docs(
        """
        , tok AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        h AS (SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h FROM tok),
        bits AS (
          SELECT doc_id, t.i AS bit,
                 SUM(CASE WHEN (h >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM h CROSS JOIN range(0, 60) t(i)
          GROUP BY doc_id, t.i)
        SELECT doc_id,
               -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas
               -- degrades to float64 and loses 60-bit precision
               CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << bit)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
        """
    ),
)
register(
    "q_dedup_simhash_pairs",
    lambda s, d: dedup.simhash_near_pairs(_docs(s, d), max_hamming=8),
    # oracle: brute-force pairwise hamming over the (oracle-checked)
    # signatures — the banded Spark plan has no false negatives by
    # pigeonhole and verifies exactly, so the sets must match
    _q_docs(
        """
        , tok AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        h AS (SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h FROM tok),
        bits AS (
          SELECT doc_id, t.i AS bit,
                 SUM(CASE WHEN (h >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM h CROSS JOIN range(0, 60) t(i)
          GROUP BY doc_id, t.i),
        sig AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << bit)
                               ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        """
    ),
)
register(
    "q_dedup_embedding",
    lambda s, d: dedup.embedding_neardup_pairs(_ref(s, d).embeddings, threshold=0.4),
    _q_vec(
        """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(SUM(a.v[t.i] * b.v[t.i])
                     / (SQRT(SUM(a.v[t.i] * a.v[t.i])) * SQRT(SUM(b.v[t.i] * b.v[t.i]))),
                     6) AS similarity
        FROM vec a, vec b, range(1, 65) t(i)
        WHERE a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
        HAVING similarity >= 0.4
        """
    ),
)

# text analysis
_SW_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
_SW_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in sorted(STOPWORDS.items()) for w in ws
)

register(
    "q_text_tokens",
    lambda s, d: textstats.token_counts(_docs(s, d)),
    _q_docs(
        f"""
        SELECT doc_id, CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(norm, '{textstats.TOKEN_RE}')) AS BIGINT) AS n_regex_tokens
        FROM norm
        """
    ),
)
register(
    "q_text_quality",
    lambda s, d: textstats.quality_scores(_docs(s, d)),
    _q_docs(
        f"""
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        agg AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 ROUND(AVG(CASE WHEN token IN ({_SW_EN}) THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio,
                 ROUND(AVG(CAST(length(token) AS DOUBLE)), 6) AS mean_token_len
          FROM tok GROUP BY doc_id)
        SELECT a.doc_id, a.n_tokens, a.stopword_ratio,
               ROUND(CAST(length(n.norm) - length(regexp_replace(n.norm, '[.,;:!?]', '', 'g')) AS DOUBLE)
                     / length(n.norm), 6) AS punct_ratio,
               a.mean_token_len
        FROM agg a JOIN norm n USING (doc_id)
        """
    ),
)
register(
    "q_text_langid",
    lambda s, d: textstats.language_id(s, _docs(s, d)),
    _q_docs(
        f"""
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        sw(lang, word) AS (VALUES {_SW_VALUES}),
        hits AS (
          SELECT doc_id, lang, COUNT(*) AS h
          FROM tok JOIN sw ON tok.token = sw.word
          GROUP BY 1, 2),
        best AS (
          SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) AS rn
            FROM hits) WHERE rn = 1)
        SELECT n.doc_id,
               CASE WHEN CAST(length(n.norm) - length(regexp_replace(n.norm, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS DOUBLE)
                         / length(n.norm) > 0.3 THEN 'zh'
                    ELSE COALESCE(b.lang, 'und') END AS lang_guess
        FROM norm n LEFT JOIN best b USING (doc_id)
        """
    ),
)
register(
    "q_text_tfidf",
    lambda s, d: textstats.tfidf_top_terms(_docs(s, d), top_n=5),
    _q_docs(
        """
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        tc AS (SELECT doc_id, token, COUNT(*) AS tc FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        df AS (SELECT token, COUNT(*) AS df FROM tc GROUP BY 1),
        nd AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT tc.doc_id, tc.token,
                 ROUND((CAST(tc.tc AS DOUBLE) / dl.dl) * ln(CAST(nd.n AS DOUBLE) / df.df), 6) AS tfidf
          FROM tc JOIN dl USING (doc_id) JOIN df USING (token) CROSS JOIN nd)
        SELECT doc_id, token, tfidf FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) AS rn
          FROM scored) WHERE rn <= 5
        """
    ),
)
register(
    "q_text_source_stats",
    lambda s, d: textstats.source_stats(_docs(s, d)),
    _q_docs(
        """
        SELECT d.source, COUNT(*) AS n_docs, ROUND(AVG(d.n_chars), 6) AS avg_chars,
               CAST(SUM(CAST(len(string_split(n.norm, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens
        FROM documents d JOIN norm n USING (doc_id)
        GROUP BY d.source
        """
    ),
)

def _skew_report(s: SparkSession, d: str) -> DataFrame:
    """Skew profile of the co-rating join key (per-book rater counts) —
    the decision input for the J3 salting/cap strategy."""
    from .operators.diagnostics import skew_report

    pos = corating.positive_ratings(_ref(s, d).ratings).select("isbn")
    return skew_report(pos, ["isbn"], top_n=10)


register(
    "q_diag_corating_skew",
    _skew_report,
    _q(
        """
        SELECT isbn, n, share FROM (
          SELECT isbn, COUNT(*) AS n,
                 ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM ratings WHERE rating >= 6) AS DOUBLE), 6) AS share
          FROM ratings WHERE rating >= 6 GROUP BY isbn)
        ORDER BY n DESC, isbn LIMIT 10
        """
    ),
)


def _corpus_clean(s: SparkSession, d: str) -> DataFrame:
    """Composed training-data cleaning pass: token-count bounds +
    stopword-ratio floor (quality), then canonical-fingerprint dedup
    keeping the smallest doc_id — the surviving corpus."""
    docs = _docs(s, d)
    q = textstats.quality_scores(docs)
    keep = q.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 500)
        & (F.col("stopword_ratio") >= 0.01)
    ).select("doc_id")
    survivors = docs.join(keep, "doc_id", "left_semi")
    deduped = dedup.dedup_fingerprint(survivors).select(
        F.col("keep_id").alias("doc_id"), "group_size"
    )
    return deduped.join(docs.select("doc_id", "source", "lang"), "doc_id").select(
        "doc_id", "source", "lang", "group_size"
    )


# Full oracle for the corpus-dedup decision table: the MinHash candidate
# pairs are deterministic (md5 + fixed LCG coefficients), and the
# connected-components collapse is a recursive-CTE transitive min-label
# closure (same construction as q_graph_components). Upgrades what was a
# rows-only check to a value-hash compare of every (doc, group, keep) row.
_DEDUP_GROUPS_ORACLE = _q_docs(
    f"""
    , coef(seed, a, b) AS (VALUES {_MINHASH_COEF_VALUES}),
    base AS (
      SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM sh),
    sig AS (
      SELECT doc_id, seed, MIN((a * h + b) % {dedup.MINHASH_PRIME}) AS mh
      FROM base CROSS JOIN coef
      GROUP BY doc_id, seed),
    bnd AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
      FROM sig GROUP BY doc_id, seed // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bnd a JOIN bnd b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    est AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS ej
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
      GROUP BY 1, 2),
    ed AS (
      SELECT doc_a AS s, doc_b AS d FROM est WHERE ej >= 0.5
      UNION ALL
      SELECT doc_b, doc_a FROM est WHERE ej >= 0.5),
    reach(node, label) AS (
      SELECT s, s FROM ed
      UNION
      SELECT e.d, r.label FROM reach r JOIN ed e ON e.s = r.node
      WHERE r.label < e.d),
    comp AS (SELECT node AS doc_id, MIN(label) AS group_id FROM reach GROUP BY node)
    SELECT doc.doc_id,
           COALESCE(c.group_id, doc.doc_id) AS group_id,
           doc.doc_id = COALESCE(c.group_id, doc.doc_id) AS keep
    FROM documents doc LEFT JOIN comp c USING (doc_id)
    """
).replace("WITH ", "WITH RECURSIVE ", 1)

register(
    "q_corpus_dedup_groups",
    lambda s, d: dedup.corpus_dedup_groups(_docs(s, d), threshold=0.5),
    _DEDUP_GROUPS_ORACLE,
)
_KEEP_BEST_ORACLE = _DEDUP_GROUPS_ORACLE.replace(
    """    SELECT doc.doc_id,
           COALESCE(c.group_id, doc.doc_id) AS group_id,
           doc.doc_id = COALESCE(c.group_id, doc.doc_id) AS keep
    FROM documents doc LEFT JOIN comp c USING (doc_id)""",
    """    , g AS (
      SELECT doc.doc_id, COALESCE(c.group_id, doc.doc_id) AS group_id
      FROM documents doc LEFT JOIN comp c USING (doc_id)),
    nt AS (SELECT doc_id, CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens FROM norm)
    SELECT doc_id, group_id, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY group_id ORDER BY n_tokens DESC, doc_id) = 1 AS keep
    FROM g JOIN nt USING (doc_id)""",
)
assert _KEEP_BEST_ORACLE != _DEDUP_GROUPS_ORACLE, "keep-best oracle tail rewrite failed"

# dedup-aware split: groups assigned atomically to train/test by the md5
# bucket of the group id (leakage-proof split, Lee et al. ACL 2022)
_SPLIT_ORACLE = _DEDUP_GROUPS_ORACLE.replace(
    """    SELECT doc.doc_id,
           COALESCE(c.group_id, doc.doc_id) AS group_id,
           doc.doc_id = COALESCE(c.group_id, doc.doc_id) AS keep
    FROM documents doc LEFT JOIN comp c USING (doc_id)""",
    """    , g AS (
      SELECT doc.doc_id, COALESCE(c.group_id, doc.doc_id) AS group_id
      FROM documents doc LEFT JOIN comp c USING (doc_id))
    SELECT doc_id, group_id,
           CASE WHEN CAST(('0x' || substr(md5(CAST(group_id AS VARCHAR) || '#5'), 1, 8)) AS BIGINT)
                     % 1000000 < 100000
                THEN 'test' ELSE 'train' END AS split
    FROM g""",
)
assert _SPLIT_ORACLE != _DEDUP_GROUPS_ORACLE, "split oracle tail rewrite failed"

register(
    "q_corpus_split_dedup_aware",
    lambda s, d: dedup.dedup_aware_split(_docs(s, d), test_fraction=0.1, seed=5),
    _SPLIT_ORACLE,
)

register(
    "q_corpus_dedup_keep_best",
    lambda s, d: dedup.corpus_dedup_keep_best(_docs(s, d), threshold=0.5),
    _KEEP_BEST_ORACLE,
)


def _corpus_diff_q(s: SparkSession, d: str) -> DataFrame:
    """Snapshot delta between the corpus and a deterministically-derived
    v2 (5% of ids dropped, 3% text-revised, 3% re-added under new ids —
    all md5-bucket decisions both engines rebuild exactly): the
    added/removed/changed/unchanged table an incremental pipeline keys
    its re-processing on."""
    from .operators.etl import corpus_diff
    from .operators.sampling import sample_bucket

    docs = _docs(s, d)
    b = sample_bucket("doc_id", seed=21)
    kept = docs.filter(b < 950_000)
    v2base = kept.select(
        "doc_id",
        F.when(b < 30_000, F.concat(F.col("text"), F.lit(" revised")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter((b >= 30_000) & (b < 60_000)).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    return corpus_diff(docs, v2base.unionByName(added))


register(
    "q_corpus_diff",
    _corpus_diff_q,
    r"""
    WITH b AS (
      SELECT doc_id, text,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#21'), 1, 8)) AS BIGINT)
             % 1000000 AS bk
      FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN bk < 30000 THEN text || ' revised' ELSE text END AS text
      FROM b WHERE bk < 950000
      UNION ALL
      SELECT doc_id + 10000000, text FROM b WHERE bk >= 30000 AND bk < 60000),
    fo AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))), ' ')) AS f
      FROM documents),
    fn AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))), ' ')) AS f
      FROM v2)
    SELECT COALESCE(fo.doc_id, fn.doc_id) AS doc_id,
           CASE WHEN fo.doc_id IS NULL THEN 'added'
                WHEN fn.doc_id IS NULL THEN 'removed'
                WHEN fo.f <> fn.f THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM fo FULL OUTER JOIN fn ON fo.doc_id = fn.doc_id
    """,
)


register(
    "q_dedup_novelty",
    lambda s, d: dedup.novelty_scores(_docs(s, d), n=8),
    _q_docs(
        """
        , grams AS (
          SELECT doc_id,
                 unnest([md5(array_to_string(list_slice(t, i, i + 7), ' '))
                         for i in range(1, greatest(len(t) - 7, 1) + 1)]) AS h
          FROM toks),
        pdg AS (SELECT doc_id, h, COUNT(*) AS c FROM grams GROUP BY 1, 2),
        gd AS (SELECT h, COUNT(*) AS nd FROM pdg GROUP BY h)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
               ROUND(SUM(CASE WHEN nd = 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE), 6) AS novelty
        FROM pdg JOIN gd USING (h) GROUP BY doc_id
        """
    ),
)


def _ingest_neardup_q(s: SparkSession, d: str) -> DataFrame:
    """Near-dup-aware ingest decision table (round-5 VERDICT item 3): the
    even-doc_id half of the corpus plays the standing corpus (its
    fingerprint+signature INDEX is what a real ingest would have
    persisted — taken as-is, no internal dedup), the odd half arrives as
    one batch. Attests the full decision kernel: exact anti-join on the
    index, banded-signature near-dup candidates vs the index, and the
    in-batch greedy first-writer-wins (LFMIS) resolution."""
    from .functions.text import canonical_fingerprint

    docs = _docs(s, d)
    standing = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    index = standing.select(
        "doc_id", canonical_fingerprint(F.col("text")).alias("fingerprint")
    ).join(dedup.minhash_signature_arrays(standing), "doc_id", "left").select(
        "fingerprint", "sig"
    )
    return dedup.ingest_neardup_decisions(index, incoming, threshold=0.5)


def _lfmis_rounds_sql(rounds: int) -> str:
    """Unrolled parallel-LFMIS rounds over CTEs ``live`` (undecided ids)
    and ``edges`` (a < b duplicate pairs): the same peel-round unroll
    pattern as the k-truss oracle, ending in ``kept`` plus a loud error()
    if the duplicate-chain depth exceeds the unroll budget."""
    # every round CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and each round references the previous one ~3 times —
    # an un-materialized unroll re-expands the whole chain 3^rounds times
    parts = [
        "u0 AS MATERIALIZED (SELECT doc_id FROM live)",
        "k0 AS MATERIALIZED (SELECT doc_id FROM live WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts += [
            f"p{i} AS MATERIALIZED (SELECT DISTINCT e.b AS doc_id FROM edges e JOIN u{p} u ON u.doc_id = e.a)",
            f"f{i} AS MATERIALIZED (SELECT doc_id FROM u{p} WHERE doc_id NOT IN (SELECT doc_id FROM p{i}))",
            f"kb{i} AS MATERIALIZED (SELECT DISTINCT e.b AS doc_id FROM edges e JOIN k{p} k ON k.doc_id = e.a)",
            f"k{i} AS MATERIALIZED (SELECT doc_id FROM k{p} UNION "
            f"SELECT doc_id FROM f{i} WHERE doc_id NOT IN (SELECT doc_id FROM kb{i}))",
            f"u{i} AS MATERIALIZED (SELECT doc_id FROM u{p} WHERE doc_id NOT IN (SELECT doc_id FROM f{i}))",
        ]
    parts += [
        f"conv AS (SELECT CASE WHEN EXISTS (SELECT 1 FROM u{rounds}) "
        f"THEN CAST(error('LFMIS oracle: dup-chain depth exceeds {rounds} unrolled rounds') AS INT) "
        "ELSE 1 END AS ok)",
        f"kept AS (SELECT doc_id FROM k{rounds})",
    ]
    return ",\n    ".join(parts)


register(
    "q_ingest_neardup",
    _ingest_neardup_q,
    _q_docs(
        f"""
        , coef(seed, a, b) AS (VALUES {_MINHASH_COEF_VALUES}),
        base AS (
          SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
          FROM sh),
        sig AS MATERIALIZED (
          SELECT doc_id, seed, MIN((a * h + b) % {dedup.MINHASH_PRIME}) AS mh
          FROM base CROSS JOIN coef
          GROUP BY doc_id, seed),
        bnd AS MATERIALIZED (
          SELECT doc_id, seed // 4 AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
          FROM sig GROUP BY doc_id, seed // 4),
        fp AS MATERIALIZED (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' ')) AS f
          FROM norm),
        std AS MATERIALIZED (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
        inc AS MATERIALIZED (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
        std_fp AS MATERIALIZED (SELECT DISTINCT f.f FROM fp f JOIN std s USING (doc_id)),
        ex_idx AS (
          SELECT i.doc_id FROM inc i JOIN fp fi USING (doc_id)
          WHERE fi.f IN (SELECT f FROM std_fp)),
        cand_idx AS (
          SELECT DISTINCT a.doc_id AS ai, b.doc_id AS bi
          FROM bnd a JOIN bnd b ON a.band = b.band AND a.band_key = b.band_key
          JOIN inc i ON i.doc_id = a.doc_id
          JOIN std s ON s.doc_id = b.doc_id),
        est_idx AS (
          SELECT c.ai, c.bi,
                 ROUND(AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS ej
          FROM cand_idx c
          JOIN sig sa ON sa.doc_id = c.ai
          JOIN sig sb ON sb.doc_id = c.bi AND sb.seed = sa.seed
          GROUP BY c.ai, c.bi),
        near_idx AS (SELECT DISTINCT ai AS doc_id FROM est_idx WHERE ej >= 0.5),
        dropped_idx AS MATERIALIZED (SELECT doc_id FROM ex_idx UNION SELECT doc_id FROM near_idx),
        live AS MATERIALIZED (
          SELECT doc_id FROM inc
          WHERE doc_id NOT IN (SELECT doc_id FROM dropped_idx)),
        fp_e AS (
          SELECT fa.doc_id AS a, fb.doc_id AS b
          FROM fp fa JOIN fp fb ON fa.f = fb.f AND fa.doc_id < fb.doc_id
          WHERE fa.doc_id IN (SELECT doc_id FROM live)
            AND fb.doc_id IN (SELECT doc_id FROM live)),
        cand_b AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM bnd a JOIN bnd b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          WHERE a.doc_id IN (SELECT doc_id FROM live)
            AND b.doc_id IN (SELECT doc_id FROM live)),
        est_b AS (
          SELECT c.a, c.b,
                 ROUND(AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS ej
          FROM cand_b c
          JOIN sig sa ON sa.doc_id = c.a
          JOIN sig sb ON sb.doc_id = c.b AND sb.seed = sa.seed
          GROUP BY c.a, c.b),
        near_e AS (SELECT a, b FROM est_b WHERE ej >= 0.5),
        edges AS MATERIALIZED (SELECT a, b FROM fp_e UNION SELECT a, b FROM near_e),
        {_lfmis_rounds_sql(8)},
        exact_any AS (
          SELECT i.doc_id FROM inc i JOIN fp fi USING (doc_id)
          WHERE fi.f IN (SELECT f FROM std_fp)
             OR EXISTS (SELECT 1 FROM kept k JOIN fp fk ON fk.doc_id = k.doc_id
                        WHERE fk.f = fi.f AND k.doc_id < i.doc_id))
        SELECT i.doc_id,
               CASE WHEN i.doc_id IN (SELECT doc_id FROM kept) THEN 'kept'
                    WHEN i.doc_id IN (SELECT doc_id FROM exact_any) THEN 'dup_exact'
                    ELSE 'dup_near' END AS status
        FROM inc i CROSS JOIN conv
        """
    ),
)


register(
    "q_text_paragraph_langs",
    lambda s, d: textstats.paragraph_language_profile(s, _superdocs(s, d)),
    f"""
    WITH sd AS (
      SELECT doc_id // 8 AS sd_id,
             string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS sd_text
      FROM documents GROUP BY doc_id // 8),
    para0 AS (
      SELECT sd_id, unnest([{{'para_idx': i - 1, 'ptext': p[i]}} for i in range(1, len(p) + 1)],
                           recursive := true)
      FROM (SELECT sd_id, string_split(sd_text, chr(10) || chr(10)) AS p FROM sd)),
    para AS (
      SELECT sd_id, sd_id * 65536 + para_idx AS pk, ptext
      FROM para0 WHERE trim(ptext) <> ''),
    pn AS MATERIALIZED (
      SELECT pk, sd_id, trim(regexp_replace(lower(ptext), '\\s+', ' ', 'g')) AS norm
      FROM para),
    ptok AS (SELECT pk, unnest(string_split(norm, ' ')) AS token FROM pn),
    sw(lang, word) AS (VALUES {{SW}}),
    hits AS (
      SELECT pk, lang, COUNT(*) AS h
      FROM ptok JOIN sw ON ptok.token = sw.word
      GROUP BY 1, 2),
    best AS (
      SELECT pk, lang FROM (
        SELECT pk, lang, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY h DESC, lang) AS rn
        FROM hits) WHERE rn = 1),
    plang AS MATERIALIZED (
      SELECT pn.sd_id,
             CASE WHEN CAST(length(pn.norm) - length(regexp_replace(pn.norm, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS DOUBLE)
                       / length(pn.norm) > 0.3 THEN 'zh'
                  ELSE COALESCE(b.lang, 'und') END AS lang
      FROM pn LEFT JOIN best b USING (pk)),
    cnt AS (SELECT sd_id, lang, COUNT(*) AS c FROM plang GROUP BY 1, 2),
    maj AS (
      SELECT sd_id, lang, c FROM (
        SELECT sd_id, lang, c, ROW_NUMBER() OVER (PARTITION BY sd_id ORDER BY c DESC, lang) AS rn
        FROM cnt) WHERE rn = 1),
    tot AS (SELECT sd_id, COUNT(*) AS np FROM plang GROUP BY sd_id)
    SELECT t.sd_id AS doc_id, CAST(t.np AS BIGINT) AS n_paras,
           m.lang AS majority_lang,
           ROUND(CAST(m.c AS DOUBLE) / t.np, 6) AS lang_consistency,
           m.c < t.np AS is_mixed
    FROM tot t JOIN maj m USING (sd_id)
    """.replace("{SW}", _SW_VALUES),
)


register(
    "q_dedup_cdc_chunks",
    lambda s, d: dedup.cdc_chunk_fingerprints(_docs(s, d), boundary_mod=16),
    _q_docs(
        """
        , tk AS (
          SELECT doc_id, unnest([{'pos': i - 1, 'token': t[i]} for i in range(1, len(t) + 1)],
                                recursive := true)
          FROM toks),
        fl AS (
          SELECT doc_id, pos, token,
                 CASE WHEN CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16 = 0
                      THEN 1 ELSE 0 END AS b
          FROM tk),
        ch AS (
          SELECT doc_id, pos, token,
                 COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
          FROM fl)
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_hash
        FROM ch GROUP BY doc_id, chunk_idx
        """
    ),
)


register(
    "q_dedup_cdc_pairs",
    lambda s, d: dedup.cdc_shared_pairs(
        _docs(s, d), boundary_mod=16, min_shared=2, max_docs_per_chunk=None
    ),
    _q_docs(
        """
        , tk AS (
          SELECT doc_id, unnest([{'pos': i - 1, 'token': t[i]} for i in range(1, len(t) + 1)],
                                recursive := true)
          FROM toks),
        fl AS (
          SELECT doc_id, pos, token,
                 CASE WHEN CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16 = 0
                      THEN 1 ELSE 0 END AS b
          FROM tk),
        ch AS (
          SELECT doc_id, pos, token,
                 COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
          FROM fl),
        hashes AS MATERIALIZED (
          SELECT DISTINCT doc_id, md5(string_agg(token, ' ' ORDER BY pos)) AS h
          FROM ch GROUP BY doc_id, chunk_idx)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared_chunks
        FROM hashes a JOIN hashes b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """
    ),
)


register(
    "q_dedup_cross_spans",
    lambda s, d: dedup.remove_cross_doc_spans(
        _docs(s, d), boundary_mod=16, min_tokens=2
    ),
    _q_docs(
        """
        , tk AS (
          SELECT doc_id, unnest([{'pos': i - 1, 'token': t[i]} for i in range(1, len(t) + 1)],
                                recursive := true)
          FROM toks),
        fl AS (
          SELECT doc_id, pos, token,
                 CASE WHEN CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16 = 0
                      THEN 1 ELSE 0 END AS b
          FROM tk),
        ch AS MATERIALIZED (
          SELECT doc_id, pos, token,
                 COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
          FROM fl),
        chunks AS MATERIALIZED (
          SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
                 md5(string_agg(token, ' ' ORDER BY pos)) AS h
          FROM ch GROUP BY doc_id, chunk_idx),
        owner AS (SELECT h, MIN(doc_id) AS owner FROM chunks GROUP BY h),
        doomed AS (
          SELECT c.doc_id, c.chunk_idx FROM chunks c JOIN owner o USING (h)
          WHERE c.doc_id > o.owner AND c.n_tokens >= 2),
        kept AS (
          SELECT c.doc_id, c.pos, c.token FROM ch c
          ANTI JOIN doomed d ON c.doc_id = d.doc_id AND c.chunk_idx = d.chunk_idx),
        reb AS (
          SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
                 COUNT(*) AS kept_n
          FROM kept GROUP BY doc_id),
        tot AS (SELECT doc_id, len(t) AS n FROM toks)
        SELECT tot.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
               CAST(tot.n - COALESCE(reb.kept_n, 0) AS BIGINT) AS n_removed_tokens
        FROM tot LEFT JOIN reb USING (doc_id)
        """
    ),
)


def _c4_pages(s: SparkSession, d: str) -> DataFrame:
    """C4-shaped page fixture: the synthetic documents carry no sentence
    punctuation, so every C4 rule would fire identically (degenerate
    hash). Each doc becomes one 'line' with a deterministic doc_id%4
    mutation — terminal '.', terminal '?', a 4-word stub (word-count
    rule), or a trailing ' javascript.' (the js rule) — then groups of 8
    concatenate into pages, with 'lorem ipsum' / curly-brace paragraphs
    appended on sd_id%7 / sd_id%5 pages (the page-kill rules). Both
    engines rebuild the construction deterministically."""
    docs = _docs(s, d)
    stub = F.concat_ws(
        " ",
        F.slice(F.split(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "), 1, 3),
    )
    m = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(".")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.col("text"), F.lit("?")))
        .when(F.col("doc_id") % 4 == 2, F.concat(stub, F.lit(" done.")))
        .otherwise(F.concat(F.col("text"), F.lit(" javascript.")))
        .alias("text"),
    )
    pages = (
        m.groupBy(F.expr("doc_id div 8").alias("sd_id"))
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda x: x["text"],
                ),
            ).alias("page")
        )
    )
    return pages.select(
        F.col("sd_id").alias("doc_id"),
        F.concat(
            F.col("page"),
            F.when(
                F.col("sd_id") % 7 == 0, F.lit("\n\nlorem ipsum dolor sit.")
            ).otherwise(F.lit("")),
            F.when(
                F.col("sd_id") % 5 == 0, F.lit("\n\nthis page has a { brace }.")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


register(
    "q_text_c4_clean",
    lambda s, d: textstats.c4_paragraph_clean(_c4_pages(s, d)),
    r"""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN text || '.'
               WHEN 1 THEN text || '?'
               WHEN 2 THEN array_to_string(list_slice(
                             string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
                             1, 3), ' ') || ' done.'
               ELSE text || ' javascript.'
             END AS text
      FROM documents),
    pg AS (
      SELECT doc_id // 8 AS sd_id,
             string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS page
      FROM m GROUP BY doc_id // 8),
    pages AS (
      SELECT sd_id AS doc_id,
             page
             || CASE WHEN sd_id % 7 = 0
                     THEN chr(10) || chr(10) || 'lorem ipsum dolor sit.'
                     ELSE '' END
             || CASE WHEN sd_id % 5 = 0
                     THEN chr(10) || chr(10) || 'this page has a { brace }.'
                     ELSE '' END AS text
      FROM pg),
    pr AS (
      SELECT doc_id, text,
             list_filter(list_transform(string_split(text, chr(10) || chr(10)),
                                        p -> trim(p)),
                         p -> p <> '') AS paras
      FROM pages),
    kp AS (
      SELECT doc_id, text, paras,
             list_filter(paras,
                         p -> regexp_matches(p, '[.!?"]$')
                              AND len(string_split(trim(regexp_replace(p, '\s+', ' ', 'g')), ' ')) >= 5
                              AND strpos(lower(p), 'javascript') = 0) AS kept
      FROM pr),
    cl AS (
      -- array_to_string of an EMPTY list is NULL in DuckDB (Spark's
      -- concat_ws gives ''), so coalesce to keep the engines aligned
      SELECT doc_id, text, paras, kept,
             COALESCE(array_to_string(kept, chr(10) || chr(10)), '') AS clean_text
      FROM kp)
    SELECT doc_id, clean_text,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(len(paras) - len(kept) AS BIGINT) AS n_dropped,
           CAST(length(clean_text) - length(regexp_replace(clean_text, '[.!?]', '', 'g')) AS BIGINT)
             AS n_sentences,
           (length(clean_text) - length(regexp_replace(clean_text, '[.!?]', '', 'g')) >= 3
            AND strpos(lower(text), 'lorem ipsum') = 0
            AND strpos(text, '{') = 0) AS keep_doc
    FROM cl
    """,
)


def _ingest_spanscrub_q(s: SparkSession, d: str) -> DataFrame:
    """Span-scrub ingest decisions over the seed-7 30/70 split: the
    standing corpus contributes its chunk-hash index, the incoming 70%
    arrives as ONE batch — which, by the batching-invariance contract
    (ownership on submitted text: index ∪ smaller-id batch docs), is
    exactly what any micro-batched or streamed ingest of the same docs
    stores. The oracle re-derives the combined ownership rule in SQL."""
    from .operators.sampling import sample_bucket

    docs = _docs(s, d)
    b = sample_bucket("doc_id", seed=7)
    idx = dedup.cdc_chunk_fingerprints(
        docs.filter(b < 300_000), boundary_mod=16
    ).select("chunk_hash")
    scrubbed, _new = dedup.ingest_spanscrub_decisions(
        idx, docs.filter(b >= 300_000), boundary_mod=16, min_tokens=2
    )
    return scrubbed


register(
    "q_ingest_spanscrub",
    _ingest_spanscrub_q,
    _q_docs(
        r"""
        , bk AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#7'), 1, 8)) AS BIGINT)
                 % 1000000 AS bk
          FROM documents),
        tk AS (
          SELECT toks.doc_id, bk,
                 unnest([{'pos': i - 1, 'token': t[i]} for i in range(1, len(t) + 1)],
                        recursive := true)
          FROM toks JOIN bk USING (doc_id)),
        fl AS (
          SELECT doc_id, bk, pos, token,
                 CASE WHEN CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16 = 0
                      THEN 1 ELSE 0 END AS b
          FROM tk),
        ch AS MATERIALIZED (
          SELECT doc_id, bk, pos, token,
                 COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
          FROM fl),
        shash AS MATERIALIZED (
          SELECT DISTINCT md5(string_agg(token, ' ' ORDER BY pos)) AS h
          FROM ch WHERE bk < 300000 GROUP BY doc_id, chunk_idx),
        ichunks AS MATERIALIZED (
          SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
                 md5(string_agg(token, ' ' ORDER BY pos)) AS h
          FROM ch WHERE bk >= 300000 GROUP BY doc_id, chunk_idx),
        owner AS (
          SELECT h, MIN(doc_id) AS owner FROM ichunks WHERE n_tokens >= 2 GROUP BY h),
        doomed AS (
          SELECT c.doc_id, c.chunk_idx FROM ichunks c
          LEFT JOIN shash s ON c.h = s.h
          LEFT JOIN owner o ON c.h = o.h
          WHERE c.n_tokens >= 2 AND (s.h IS NOT NULL OR c.doc_id > o.owner)),
        kept AS (
          SELECT c.doc_id, c.pos, c.token FROM ch c
          ANTI JOIN doomed d ON c.doc_id = d.doc_id AND c.chunk_idx = d.chunk_idx
          WHERE c.bk >= 300000),
        reb AS (
          SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
                 COUNT(*) AS kept_n
          FROM kept GROUP BY doc_id),
        tot AS (
          SELECT toks.doc_id, len(t) AS n FROM toks JOIN bk USING (doc_id)
          WHERE bk >= 300000)
        SELECT tot.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
               CAST(tot.n - COALESCE(reb.kept_n, 0) AS BIGINT) AS n_removed_tokens
        FROM tot LEFT JOIN reb USING (doc_id)
        """
    ),
)


def _line_pages(s: SparkSession, d: str) -> DataFrame:
    """Line-bearing pages for the line-repetition query: 8 docs per page
    joined by newlines, with the page's FIRST doc re-appended — every
    page then carries at least one guaranteed duplicated line, and the
    corpus's planted exact/near-dup documents add naturally varying
    ones. Both engines rebuild the construction deterministically."""
    docs = _docs(s, d)
    g = docs.groupBy(F.expr("doc_id div 8").alias("sd_id")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda x: x["text"],
        ).alias("ls")
    )
    return g.select(
        F.col("sd_id").alias("doc_id"),
        F.concat(
            F.concat_ws("\n", F.col("ls")), F.lit("\n"), F.element_at("ls", 1)
        ).alias("text"),
    )


register(
    "q_text_line_repetition",
    lambda s, d: textstats.line_repetition_scores(_line_pages(s, d)),
    r"""
    WITH pg AS (
      SELECT doc_id // 8 AS sd_id,
             string_agg(text, chr(10) ORDER BY doc_id) || chr(10)
               || arg_min(text, doc_id) AS text
      FROM documents GROUP BY doc_id // 8),
    ln0 AS (SELECT sd_id, trim(unnest(string_split(text, chr(10)))) AS line FROM pg),
    ln AS (SELECT sd_id, line FROM ln0 WHERE line <> ''),
    lc AS (SELECT sd_id, line, COUNT(*) AS c, length(line) AS len
           FROM ln GROUP BY sd_id, line)
    SELECT sd_id AS doc_id,
           CAST(SUM(c) AS BIGINT) AS n_lines,
           ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE), 6)
             AS dup_line_fraction,
           ROUND(SUM(CASE WHEN c > 1 THEN c * len ELSE 0 END)
                 / CAST(SUM(c * len) AS DOUBLE), 6) AS dup_line_char_fraction
    FROM lc GROUP BY sd_id
    """,
)


def _span_scrub_q(s: SparkSession, d: str) -> DataFrame:
    """Ingest-time span scrub over a deterministic 30/70 split: docs in
    md5-bucket < 300k (seed 7) play the standing corpus — reduced to its
    chunk-hash INDEX — and the rest arrive as the incoming batch, each
    scrubbed of every chunk the index already holds."""
    from .operators.sampling import sample_bucket

    docs = _docs(s, d)
    b = sample_bucket("doc_id", seed=7)
    idx = dedup.cdc_chunk_fingerprints(
        docs.filter(b < 300_000), boundary_mod=16
    ).select("chunk_hash")
    return dedup.scrub_spans_against_index(
        idx, docs.filter(b >= 300_000), boundary_mod=16, min_tokens=2
    )


register(
    "q_dedup_span_scrub",
    _span_scrub_q,
    _q_docs(
        r"""
        , bk AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#7'), 1, 8)) AS BIGINT)
                 % 1000000 AS bk
          FROM documents),
        tk AS (
          SELECT toks.doc_id, bk,
                 unnest([{'pos': i - 1, 'token': t[i]} for i in range(1, len(t) + 1)],
                        recursive := true)
          FROM toks JOIN bk USING (doc_id)),
        fl AS (
          SELECT doc_id, bk, pos, token,
                 CASE WHEN CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16 = 0
                      THEN 1 ELSE 0 END AS b
          FROM tk),
        ch AS MATERIALIZED (
          SELECT doc_id, bk, pos, token,
                 COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
          FROM fl),
        shash AS MATERIALIZED (
          SELECT DISTINCT md5(string_agg(token, ' ' ORDER BY pos)) AS h
          FROM ch WHERE bk < 300000 GROUP BY doc_id, chunk_idx),
        ichunks AS MATERIALIZED (
          SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
                 md5(string_agg(token, ' ' ORDER BY pos)) AS h
          FROM ch WHERE bk >= 300000 GROUP BY doc_id, chunk_idx),
        doomed AS (
          SELECT c.doc_id, c.chunk_idx FROM ichunks c
          SEMI JOIN shash s ON c.h = s.h
          WHERE c.n_tokens >= 2),
        kept AS (
          SELECT c.doc_id, c.pos, c.token FROM ch c
          ANTI JOIN doomed d ON c.doc_id = d.doc_id AND c.chunk_idx = d.chunk_idx
          WHERE c.bk >= 300000),
        reb AS (
          SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
                 COUNT(*) AS kept_n
          FROM kept GROUP BY doc_id),
        tot AS (
          SELECT toks.doc_id, len(t) AS n FROM toks JOIN bk USING (doc_id)
          WHERE bk >= 300000)
        SELECT tot.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
               CAST(tot.n - COALESCE(reb.kept_n, 0) AS BIGINT) AS n_removed_tokens
        FROM tot LEFT JOIN reb USING (doc_id)
        """
    ),
)


def _decontaminate_q(s: SparkSession, d: str) -> DataFrame:
    """Benchmark decontamination over a deterministic 10% eval split:
    docs in md5-bucket < 100k (seed 33) play the eval set, the rest the
    training corpus; the decision table counts each training doc's
    8-gram positions that also occur anywhere in the eval set."""
    from .operators.sampling import sample_bucket

    docs = _docs(s, d)
    b = sample_bucket("doc_id", seed=33)
    return dedup.decontaminate(
        docs.filter(b >= 100_000), docs.filter(b < 100_000), n=8
    )


register(
    "q_corpus_decontaminate",
    _decontaminate_q,
    r"""
    WITH b AS (
      SELECT doc_id, text,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#33'), 1, 8)) AS BIGINT)
             % 1000000 AS bk
      FROM documents),
    trt AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
            FROM b WHERE bk >= 100000),
    evt AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
            FROM b WHERE bk < 100000),
    trg AS MATERIALIZED (
      SELECT doc_id, unnest([md5(array_to_string(list_slice(t, i, i + 7), ' '))
                             for i in range(1, greatest(len(t) - 7, 1) + 1)]) AS h
      FROM trt),
    evg AS MATERIALIZED (
      SELECT DISTINCT h FROM (
        SELECT unnest([md5(array_to_string(list_slice(t, i, i + 7), ' '))
                       for i in range(1, greatest(len(t) - 7, 1) + 1)]) AS h
        FROM evt))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN h IN (SELECT h FROM evg) THEN 1 ELSE 0 END) AS BIGINT) AS eval_hits,
           SUM(CASE WHEN h IN (SELECT h FROM evg) THEN 1 ELSE 0 END) >= 1 AS contaminated
    FROM trg GROUP BY doc_id
    """,
)


def _superdocs(s: SparkSession, d: str) -> DataFrame:
    """Paragraph-bearing corpus for the paragraph-dedup queries: the
    synthetic documents are single-line, so groups of 8 are blank-line
    concatenated into 'superdocs' whose paragraphs are real documents —
    near-dup paragraphs then exist exactly where near-dup documents do,
    and both engines can rebuild the construction deterministically."""
    return (
        _docs(s, d)
        .groupBy(F.expr("doc_id div 8").alias("sd_id"))
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda x: x["text"],
                ),
            ).alias("text")
        )
        .select(F.col("sd_id").alias("doc_id"), "text")
    )


# Paragraph-granularity near-dedup (Lee et al. ACL 2022 §4.1 — the unit the
# span-removal operator's recipe also prescribes). Full oracle: paragraph
# split with slot-preserving indices, the same md5+LCG MinHash / banding /
# recursive min-label closure as _DEDUP_GROUPS_ORACLE, keyed on the packed
# (superdoc, paragraph) long key.
_PARA_CTES = f"""
sd AS (
  SELECT doc_id // 8 AS sd_id,
         string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS sd_text
  FROM documents GROUP BY doc_id // 8),
para0 AS (
  SELECT sd_id, unnest([{{'para_idx': i - 1, 'ptext': p[i]}} for i in range(1, len(p) + 1)],
                       recursive := true)
  FROM (SELECT sd_id, string_split(sd_text, chr(10) || chr(10)) AS p FROM sd)),
para AS (
  -- mirrors split_paragraphs' loud max_paras guard: CASE is lazily
  -- evaluated, so error() only fires on an actually-overflowing doc
  SELECT sd_id, CAST(para_idx AS INT) AS para_idx,
         CASE WHEN para_idx >= 65536
              THEN CAST(error('split_paragraphs oracle: para_idx >= max_paras=65536') AS BIGINT)
              ELSE sd_id * 65536 + para_idx END AS pk, ptext
  FROM para0 WHERE trim(ptext) <> ''),
pnorm AS (SELECT pk, trim(regexp_replace(lower(ptext), '\\s+', ' ', 'g')) AS norm FROM para),
ptoks AS (SELECT pk, string_split(norm, ' ') AS t FROM pnorm),
psh AS (
  SELECT pk, unnest(s) AS shingle FROM (
    SELECT pk, list_distinct([array_to_string(list_slice(t, i, i + 2), ' ')
                              for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS s
    FROM ptoks)),
coef(seed, a, b) AS (VALUES {_MINHASH_COEF_VALUES}),
base AS (SELECT pk, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h FROM psh),
sig AS (SELECT pk, seed, MIN((a * h + b) % {dedup.MINHASH_PRIME}) AS mh
        FROM base CROSS JOIN coef GROUP BY pk, seed),
bnd AS (SELECT pk, seed // 4 AS band,
               string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
        FROM sig GROUP BY pk, seed // 4),
cand AS (SELECT DISTINCT a.pk AS pa, b.pk AS pb
         FROM bnd a JOIN bnd b
           ON a.band = b.band AND a.band_key = b.band_key AND a.pk < b.pk),
est AS (SELECT c.pa, c.pb,
               ROUND(AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS ej
        FROM cand c
        JOIN sig sa ON sa.pk = c.pa
        JOIN sig sb ON sb.pk = c.pb AND sb.seed = sa.seed
        GROUP BY 1, 2),
ed AS (SELECT pa AS s, pb AS d FROM est WHERE ej >= 0.5
       UNION ALL SELECT pb, pa FROM est WHERE ej >= 0.5),
reach(node, label) AS (
  SELECT s, s FROM ed
  UNION
  SELECT e.d, r.label FROM reach r JOIN ed e ON e.s = r.node
  WHERE r.label < e.d),
comp AS (SELECT node AS pk, MIN(label) AS group_id FROM reach GROUP BY node)
""".strip()

register(
    "q_dedup_paragraphs",
    lambda s, d: dedup.dedup_paragraphs(_superdocs(s, d), threshold=0.5),
    f"""
    WITH RECURSIVE {_PARA_CTES}
    SELECT p.sd_id AS doc_id, p.para_idx,
           CAST(COALESCE(c.group_id, p.pk) AS BIGINT) AS group_id,
           p.pk = COALESCE(c.group_id, p.pk) AS keep
    FROM para p LEFT JOIN comp c USING (pk)
    """,
)

register(
    "q_dedup_paragraphs_clean",
    lambda s, d: dedup.remove_duplicate_paragraphs(_superdocs(s, d), threshold=0.5),
    f"""
    WITH RECURSIVE {_PARA_CTES},
    tagged AS (
      SELECT p.sd_id, p.para_idx, p.ptext,
             p.pk = COALESCE(c.group_id, p.pk) AS keep
      FROM para p LEFT JOIN comp c USING (pk))
    SELECT s.sd_id AS doc_id,
           CAST(COALESCE(t.n_paras, 0) AS BIGINT) AS n_paras,
           CAST(COALESCE(t.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(t.text, '') AS text
    FROM (SELECT DISTINCT sd_id FROM sd) s
    LEFT JOIN (
      SELECT sd_id, COUNT(*) AS n_paras,
             SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
             COALESCE(string_agg(CASE WHEN keep THEN ptext END,
                                 chr(10) || chr(10) ORDER BY para_idx), '') AS text
      FROM tagged GROUP BY sd_id) t ON t.sd_id = s.sd_id
    """,
)
register(
    "q_corpus_clean",
    _corpus_clean,
    _q_docs(
        """
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        q AS (
          SELECT doc_id, COUNT(*) AS n_tokens,
                 AVG(CASE WHEN token IN ('the','and','of','to','a','in','is','it','for','on')
                          THEN 1.0 ELSE 0.0 END) AS stopword_ratio
          FROM tok GROUP BY doc_id),
        keep AS (SELECT doc_id FROM q
                 WHERE n_tokens BETWEEN 10 AND 500 AND stopword_ratio >= 0.01),
        fp AS (
          SELECT n.doc_id,
                 md5(array_to_string(list_sort(list_distinct(string_split(n.norm, ' '))), ' ')) AS fingerprint
          FROM norm n JOIN keep USING (doc_id)),
        dedup AS (
          SELECT MIN(doc_id) AS doc_id, COUNT(*) AS group_size
          FROM fp GROUP BY fingerprint)
        SELECT d.doc_id, doc.source, doc.lang, d.group_size
        FROM dedup d JOIN documents doc ON doc.doc_id = d.doc_id
        """
    ),
)

# PII scrubbing: counts on the original text, redaction email -> IP ->
# phone (same order both engines; DuckDB needs the 'g' flag Spark implies)
register(
    "q_text_pii",
    lambda s, d: textstats.scrub_pii(_docs(s, d)),
    f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{textstats.PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{textstats.PII_IP_RE}', '<IP>', 'g'),
               '{textstats.PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{textstats.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{textstats.PII_IP_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '{textstats.PII_PHONE_RE}')) AS BIGINT) AS n_phones
    FROM documents
    """,
)

# benchmark decontamination: pseudo-benchmark = every 97th doc, 8-gram
# overlap (Lee et al. ACL 2022 / GPT-3 appendix method)
register(
    "q_decontam",
    lambda s, d: dedup.benchmark_contamination(
        _docs(s, d).filter(F.col("doc_id") % 97 != 0),
        _docs(s, d).filter(F.col("doc_id") % 97 == 0),
        n=8,
    ),
    _q_docs(
        """
        , g8 AS (
          SELECT doc_id, unnest(s) AS shingle FROM (
            SELECT doc_id,
                   list_distinct([array_to_string(list_slice(t, i, i + 7), ' ')
                                  for i in range(1, greatest(len(t) - 7, 1) + 1)]) AS s
            FROM toks)),
        train AS (SELECT doc_id, shingle FROM g8 WHERE doc_id % 97 <> 0),
        bench AS (SELECT DISTINCT doc_id AS bench_doc, shingle FROM g8 WHERE doc_id % 97 = 0)
        SELECT t.doc_id,
               COUNT(DISTINCT t.shingle) AS n_overlap_ngrams,
               COUNT(DISTINCT b.bench_doc) AS n_benchmark_docs
        FROM train t JOIN bench b USING (shingle)
        GROUP BY t.doc_id
        """
    ),
)

# tokenizer vocabulary: dense ids by (count desc, token asc) — must be
# bit-reproducible across corpus rebuilds
def _decode_q(s: SparkSession, d: str) -> DataFrame:
    """Round-trip: decode(encode(corpus)) — equals the normalized text
    with sub-min-count/out-of-window tokens replaced by <unk>. Attests
    the vocabulary id mapping is collision-free and invertible."""
    vocab = textstats.build_vocabulary(_docs(s, d), max_size=2000, min_count=2)
    enc = textstats.encode_corpus(_docs(s, d), vocab)
    return textstats.decode_corpus(enc, vocab)


register(
    "q_corpus_decode",
    _decode_q,
    _q_docs(
        """
        , tokd AS (
          SELECT doc_id, g.i - 1 AS pos, toks[g.i] AS token
          FROM (SELECT doc_id, string_split(norm, ' ') AS toks FROM norm),
               LATERAL unnest(generate_series(1, len(toks))) g(i)),
        counts AS (
          SELECT token, COUNT(*) AS count FROM tokd GROUP BY token HAVING COUNT(*) >= 2),
        vocab AS (
          SELECT token, token_id FROM (
            SELECT token, ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1 AS token_id
            FROM counts)
          WHERE token_id < 2000)
        SELECT doc_id,
               string_agg(COALESCE(v.token, '<unk>'), ' ' ORDER BY pos) AS text
        FROM tokd t LEFT JOIN vocab v ON v.token = t.token
        GROUP BY doc_id
        """
    ),
)


register(
    "q_corpus_vocab",
    lambda s, d: textstats.build_vocabulary(_docs(s, d), max_size=2000, min_count=2),
    _q_docs(
        """
        , tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        counts AS (
          SELECT token, COUNT(*) AS count, COUNT(DISTINCT doc_id) AS n_docs
          FROM tokd GROUP BY token HAVING COUNT(*) >= 2)
        SELECT token_id, token, count, n_docs FROM (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1 AS BIGINT) AS token_id,
                 token, count, n_docs
          FROM counts)
        WHERE token_id < 2000
        """
    ),
)

def _ingest_vocab_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental vocabulary maintenance: the corpus arrives as three
    disjoint batches (doc_id % 3), each contributing only its own
    (token, count, n_docs) delta; consolidation + the shared two-level
    rank must reproduce the direct whole-corpus vocabulary bit-for-bit
    (counts and — since each doc is in exactly one batch — distinct-doc
    counts are additive). Oracle = the direct derivation."""
    docs = _docs(s, d)
    deltas = None
    for i in range(3):
        delta = textstats.token_count_table(docs.filter(F.col("doc_id") % 3 == i))
        deltas = delta if deltas is None else deltas.unionByName(delta)
    return textstats.rank_vocabulary(
        textstats.consolidate_token_counts(deltas), max_size=2000, min_count=2
    )


register(
    "q_ingest_vocab",
    _ingest_vocab_q,
    _q_docs(
        """
        , tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        counts AS (
          SELECT token, COUNT(*) AS count, COUNT(DISTINCT doc_id) AS n_docs
          FROM tokd GROUP BY token HAVING COUNT(*) >= 2)
        SELECT token_id, token, count, n_docs FROM (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1 AS BIGINT) AS token_id,
                 token, count, n_docs
          FROM counts)
        WHERE token_id < 2000
        """
    ),
)


# tokenized training corpus: vocab-mapped (doc_id, pos, token_id) stream
register(
    "q_corpus_encode",
    lambda s, d: textstats.encode_corpus(
        _docs(s, d),
        textstats.build_vocabulary(_docs(s, d), max_size=2000, min_count=2),
    ),
    _q_docs(
        """
        , tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        counts AS (
          SELECT token, COUNT(*) AS count FROM tokd GROUP BY token HAVING COUNT(*) >= 2),
        vocab AS (
          SELECT token, token_id FROM (
            SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1 AS BIGINT) AS token_id
            FROM counts)
          WHERE token_id < 2000),
        tokp AS (
          SELECT doc_id, u['pos'] AS pos, u['tok'] AS token
          FROM (SELECT doc_id,
                       unnest([{'pos': i - 1, 'tok': t[i]}
                               for i in range(1, len(t) + 1)]) AS u
                FROM toks))
        SELECT p.doc_id, CAST(p.pos AS BIGINT) AS pos,
               CAST(COALESCE(v.token_id, -1) AS BIGINT) AS token_id
        FROM tokp p LEFT JOIN vocab v USING (token)
        """
    ),
)

# shingle-frequency skew diagnostic: the profiling input for the dedup
# fan-out decisions (max_docs_per_shingle, band sizing) — the dedup-side
# twin of q_diag_corating_skew. A stop-shingle shared by 10^5 docs is the
# 10^10-row join the exact kernel's cap exists to prevent.
def _diag_shingle_skew(s: SparkSession, d: str) -> DataFrame:
    from .operators.diagnostics import skew_report

    return skew_report(
        dedup.shingle_set(_docs(s, d), "doc_id", "text", 3), ["shingle"], top_n=10
    )


register(
    "q_diag_shingle_skew",
    _diag_shingle_skew,
    _q_docs(
        """
        SELECT shingle, n, share FROM (
          SELECT shingle, COUNT(*) AS n,
                 ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM sh) AS DOUBLE), 6) AS share
          FROM sh GROUP BY shingle)
        ORDER BY n DESC, shingle LIMIT 10
        """
    ),
)

# corpus length histogram: fixed token-count bins (powers of two) — the
# length-distribution profile behind the quality filter's bounds
register(
    "q_corpus_length_hist",
    # floor(log2(n)) via integer bit length (length of the binary string),
    # never float log2 — log(x)/log(2) can land a hair under an exact
    # power of two in one engine and not the other
    lambda s, d: (
        textstats.token_counts(_docs(s, d))
        .select(
            F.least(
                F.length(F.conv(F.greatest(F.col("n_tokens"), F.lit(1)).cast("string"), 10, 2)) - 1,
                F.lit(12),
            ).cast("long").alias("log2_bucket")
        )
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    ),
    _q_docs(
        """
        SELECT CAST(LEAST(length(bin(GREATEST(len(string_split(norm, ' ')), 1))) - 1, 12) AS BIGINT)
                 AS log2_bucket,
               COUNT(*) AS n_docs
        FROM norm GROUP BY 1
        """
    ),
)

# deterministic sampling (membership = f(key, seed), engine/run/partition
# independent — the md5 bucket is reproduced verbatim in the oracle)
_SAMPLE_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#7'), 1, 8)) AS BIGINT) % 1000000"
)

register(
    "q_corpus_sample",
    lambda s, d: sampling.hash_sample(_docs(s, d), "doc_id", 0.1, seed=7).select(
        "doc_id", "lang", "source"
    ),
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_SAMPLE_BUCKET} < 100000
    """,
)
register(
    "q_corpus_sample_stratified",
    lambda s, d: sampling.stratified_sample(
        _docs(s, d), "lang", "doc_id", 0.2, seed=7
    ).select("doc_id", "lang"),
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_SAMPLE_BUCKET}, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    WHERE rn <= CEIL(n * 0.2)
    """,
)

def _corpus_train_ready(s: SparkSession, d: str) -> DataFrame:
    """The full corpus build, composed from individually-oracle-checked
    stages: quality filter → canonical-fingerprint dedup (keep smallest id)
    → PII scrub → sequence packing of the scrubbed survivors. One verified
    result for the whole training-data flow."""
    docs = _docs(s, d)
    q = textstats.quality_scores(docs)
    keep = q.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 500)
        & (F.col("stopword_ratio") >= 0.01)
    ).select("doc_id")
    survivors = docs.join(keep, "doc_id", "left_semi")
    kept_ids = dedup.dedup_fingerprint(survivors).select(
        F.col("keep_id").alias("doc_id")
    )
    corpus = survivors.join(kept_ids, "doc_id", "left_semi")
    # pin the scrubbed survivors: pack_chunks consumes this plan twice
    # (block totals + per-block window) and the n_pii join a third time —
    # unpinned, the whole filter→dedup→scrub subtree would execute 3×
    from .plans import materialize

    scr = materialize(
        textstats.scrub_pii(corpus).select(
            "doc_id",
            "clean_text",
            (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias("n_pii"),
        )
    )
    packed = packing.pack_chunks(scr, ctx_len=512, text_col="clean_text")
    return packed.join(scr.select("doc_id", "n_pii"), "doc_id")


_TRAIN_READY_ORACLE = _q_docs(
    f"""
    , tokq AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
    q AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             AVG(CASE WHEN token IN ('the','and','of','to','a','in','is','it','for','on')
                      THEN 1.0 ELSE 0.0 END) AS stopword_ratio
      FROM tokq GROUP BY doc_id),
    keep AS (SELECT doc_id FROM q
             WHERE n_tokens BETWEEN 10 AND 500 AND stopword_ratio >= 0.01),
    fp AS (
      SELECT n.doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(n.norm, ' '))), ' ')) AS fingerprint
      FROM norm n JOIN keep USING (doc_id)),
    kept AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
    scrub AS (
      SELECT d.doc_id,
             regexp_replace(regexp_replace(regexp_replace(d.text,
                 '{textstats.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{textstats.PII_IP_RE}', '<IP>', 'g'),
                 '{textstats.PII_PHONE_RE}', '<PHONE>', 'g') AS ct,
             CAST(len(regexp_extract_all(d.text, '{textstats.PII_EMAIL_RE}'))
                  + len(regexp_extract_all(d.text, '{textstats.PII_IP_RE}'))
                  + len(regexp_extract_all(d.text, '{textstats.PII_PHONE_RE}')) AS BIGINT) AS n_pii
      FROM documents d JOIN kept USING (doc_id)),
    stok AS (
      SELECT doc_id, n_pii,
             CAST(len(string_split(trim(regexp_replace(lower(ct), '\\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
      FROM scrub),
    cum AS (
      SELECT doc_id, n_tokens, n_pii,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
      FROM stok)
    SELECT doc_id, n_tokens,
           s // 512 AS pack_id,
           (s + greatest(n_tokens - 1, 0)) // 512 AS pack_last,
           s % 512 AS pack_offset,
           n_pii
    FROM cum
    """
)

register("q_corpus_train_ready", _corpus_train_ready, _TRAIN_READY_ORACLE)


# sequence packing: GPT-style concatenate-and-chunk (two-level distributed
# prefix sum in Spark; the oracle is the plain global window it must equal)
_PACK_CTX = 512
register(
    "q_corpus_pack",
    lambda s, d: packing.pack_chunks(_docs(s, d), ctx_len=_PACK_CTX),
    _q_docs(
        f"""
        , tok AS (SELECT doc_id, CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens FROM norm),
        cum AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
          FROM tok)
        SELECT doc_id, n_tokens,
               s // {_PACK_CTX} AS pack_id,
               (s + greatest(n_tokens - 1, 0)) // {_PACK_CTX} AS pack_last,
               s % {_PACK_CTX} AS pack_offset
        FROM cum
        """
    ),
)
# length-bucketed packing: the padding-efficiency layout (no document
# straddles a window). The power-of-two CASE ladder is generated once and
# shared verbatim by both engines; the oracle uses the plain per-bucket
# window the two-level Spark plan must equal.
_BUCKET_CASE = "CASE " + " ".join(
    f"WHEN n_tokens <= {w} THEN {w}" for w in [2**i for i in range(10)]
) + f" ELSE {_PACK_CTX} END"
register(
    "q_corpus_pack_buckets",
    lambda s, d: packing.pack_length_buckets(_docs(s, d), ctx_len=_PACK_CTX),
    _q_docs(
        f"""
        , nt AS (SELECT doc_id, CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens FROM norm),
        b AS (SELECT doc_id, n_tokens, {_BUCKET_CASE} AS bucket_len FROM nt),
        r AS (SELECT doc_id, n_tokens, bucket_len,
                     ROW_NUMBER() OVER (PARTITION BY bucket_len ORDER BY doc_id) - 1 AS rk
              FROM b)
        SELECT doc_id, n_tokens, CAST(bucket_len AS BIGINT) AS bucket_len,
               CAST(rk // ({_PACK_CTX} // bucket_len) AS BIGINT) AS bucket_pack,
               CAST(rk % ({_PACK_CTX} // bucket_len) AS BIGINT) AS slot
        FROM r
        """
    ),
)
register(
    "q_corpus_pack_stats",
    lambda s, d: packing.pack_stats(
        packing.pack_chunks(_docs(s, d), ctx_len=_PACK_CTX), ctx_len=_PACK_CTX
    ),
    _q_docs(
        f"""
        , tok AS (SELECT doc_id, CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens FROM norm),
        cum AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
          FROM tok),
        coords AS (
          SELECT n_tokens, s // {_PACK_CTX} AS pack_id,
                 (s + greatest(n_tokens - 1, 0)) // {_PACK_CTX} AS pack_last
          FROM cum)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(CEIL(SUM(n_tokens) / {_PACK_CTX}.0) AS BIGINT) AS n_packs,
               CAST(SUM(CASE WHEN pack_last > pack_id THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs
        FROM coords
        """
    ),
)

# domain mixing: deterministic per-source keep fractions (thresholds are
# integers on both sides so the comparison is exact)
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.25, "src2": 0.1}
_MIX_DEFAULT = 0.05
_MIX_CASE = (
    "CASE source "
    + " ".join(
        f"WHEN '{dom}' THEN {int(frac * sampling.HASH_BUCKETS)}"
        for dom, frac in sorted(_MIX_WEIGHTS.items())
    )
    + f" ELSE {int(_MIX_DEFAULT * sampling.HASH_BUCKETS)} END"
)
# deterministic epoch shuffle: shard + in-shard position are pure functions
# of (doc_id, seed) — reproducible training order, no rand(), no global sort
_SHUFFLE_ORD = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#8'), 1, 8)) AS BIGINT) % 1000000"
)
register(
    "q_corpus_shuffle",
    lambda s, d: packing.shuffle_corpus(_docs(s, d), n_shards=32, seed=7),
    f"""
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) - 1 AS BIGINT) AS pos
    FROM (
      SELECT doc_id,
             CAST(({_SAMPLE_BUCKET}) % 32 AS INTEGER) AS shard,
             {_SHUFFLE_ORD} AS ord
      FROM documents)
    """,
)

def _mix_fractions_q(s: SparkSession, d: str) -> DataFrame:
    """Temperature-scaled mixture balancing (mT5/XLM-R recipe, T=2):
    per-source keep fractions realized by down-sampling only. The Spark
    side runs the real temperature_fractions helper over a one-pass
    count; the oracle recomputes the closed form (p_d ∝ n_d^(1/T),
    keep_d ∝ (p_d/Z)/(n_d/N), max-normalized) in SQL."""
    from .operators.packing import temperature_fractions

    counts = {
        r["source"]: r["n"]
        for r in _docs(s, d)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fr = temperature_fractions(counts, temperature=2.0)
    return s.createDataFrame(
        [(k, int(counts[k]), float(round(fr[k], 6))) for k in sorted(counts)],
        "source string, n_docs long, keep_fraction double",
    )


register(
    "q_corpus_mix_fractions",
    _mix_fractions_q,
    """
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
    tot AS (SELECT SUM(n) AS t FROM c),
    p AS (SELECT source, n, POWER(CAST(n AS DOUBLE) / (SELECT t FROM tot), 0.5) AS p FROM c),
    z AS (SELECT SUM(p) AS z FROM p),
    r AS (SELECT source, n,
                 (p / (SELECT z FROM z)) / (CAST(n AS DOUBLE) / (SELECT t FROM tot)) AS raw
          FROM p),
    m AS (SELECT MAX(raw) AS m FROM r)
    SELECT source, n AS n_docs, ROUND(raw / (SELECT m FROM m), 6) AS keep_fraction FROM r
    """,
)


def _mix_unimax_q(s: SparkSession, d: str) -> DataFrame:
    """UniMax mixture allocation (Chung et al. 2023) at a budget of half
    the corpus: per-source document budgets, uniform across sources up
    to each source's availability (water-filling). The Spark side runs
    the real unimax_budgets helper over a one-pass count; the oracle
    recomputes the identical CLOSED form (prefix-monotone fully-taken
    set + single water level) in SQL — same IEEE double operations, so
    the values hash-match exactly."""
    import math

    from .operators.packing import unimax_budgets

    counts = {
        r["source"]: r["n"]
        for r in _docs(s, d)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    budget = float(math.floor(0.5 * sum(counts.values())))
    alloc = unimax_budgets(counts, budget)
    return s.createDataFrame(
        [(k, int(counts[k]), float(round(alloc[k], 6))) for k in sorted(counts)],
        "source string, n_docs long, alloc_docs double",
    )


register(
    "q_corpus_mix_unimax",
    _mix_unimax_q,
    """
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
    p AS (SELECT source, n,
            ROW_NUMBER() OVER (ORDER BY n, source) AS k,
            SUM(n) OVER (ORDER BY n, source ROWS UNBOUNDED PRECEDING) AS cum,
            (SELECT COUNT(*) FROM c) AS l
          FROM c),
    b AS (SELECT FLOOR(0.5 * CAST((SELECT SUM(n) FROM c) AS DOUBLE)) AS bud),
    f AS (SELECT p.*,
            CAST(n AS DOUBLE) <= ((SELECT bud FROM b) - CAST(cum - n AS DOUBLE)) / (l - k + 1)
              AS take_full
          FROM p),
    ks AS (SELECT COALESCE(MAX(k), 0) AS kstar FROM f WHERE take_full),
    lev AS (SELECT CASE WHEN (SELECT kstar FROM ks) < (SELECT MAX(l) FROM f)
                   THEN ((SELECT bud FROM b)
                         - CAST(COALESCE((SELECT cum FROM f WHERE k = (SELECT kstar FROM ks)), 0) AS DOUBLE))
                        / ((SELECT MAX(l) FROM f) - (SELECT kstar FROM ks))
                   ELSE 0.0 END AS t)
    SELECT source, n AS n_docs,
           ROUND(CASE WHEN k <= (SELECT kstar FROM ks) THEN CAST(n AS DOUBLE)
                      ELSE (SELECT t FROM lev) END, 6) AS alloc_docs
    FROM f
    """,
)


def _quality_deciles_q(s: SparkSession, d: str) -> DataFrame:
    """Quality deciles (NTILE-equivalent over prose-ness): the bucketing
    a curation pipeline uses for quality-stratified sampling — decile 1
    = most stopword-dense (most prose-like). Total order via (rounded
    ratio DESC, doc_id), so the tiles are engine-independent. Computed
    via histogram-derived ranks (textstats.quality_deciles), never a
    corpus-sized global window."""
    return textstats.quality_deciles(_docs(s, d), n_tiles=10)


# shared decile CTEs: the curriculum query builds on the same tiles
_DECILE_CTES = """
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
agg AS (
  SELECT doc_id,
         ROUND(AVG(CASE WHEN token IN ({_SW_EN}) THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio
  FROM tok GROUP BY doc_id),
dec AS (
  SELECT doc_id, stopword_ratio,
         CAST(NTILE(10) OVER (ORDER BY stopword_ratio DESC, doc_id) AS INT) AS decile
  FROM agg)
""".replace("{_SW_EN}", _SW_EN).strip()

register(
    "q_text_quality_deciles",
    _quality_deciles_q,
    _q_docs(f", {_DECILE_CTES}\nSELECT doc_id, stopword_ratio, decile FROM dec"),
)


def _curriculum_q(s: SparkSession, d: str) -> DataFrame:
    """Quality-curriculum training order: decile by decile (most
    prose-like first), deterministically shuffled within each decile —
    the composition of the deciles surface with the epoch-shuffle
    discipline (two-level ranks, no decile-partitioned corpus window)."""
    return packing.curriculum_order(_docs(s, d), seed=3)


register(
    "q_corpus_curriculum",
    _curriculum_q,
    _q_docs(
        f""", {_DECILE_CTES},
        h AS (
          SELECT doc_id, decile,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#3'), 1, 15)) AS BIGINT) AS hh
          FROM dec)
        SELECT doc_id, decile,
               CAST(ROW_NUMBER() OVER (PARTITION BY decile ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
        FROM h
        """
    ),
)


def _dsir_q(s: SparkSession, d: str) -> DataFrame:
    """DSIR importance scores toward the English-document target domain
    — the importance-resampling face of corpus mixing (mix_corpus picks
    by source weight; DSIR scores every doc by distributional closeness
    to a target sample)."""
    docs = _docs(s, d)
    return textstats.dsir_scores(docs, docs.filter(F.col("lang") == "en"))


# shared DSIR oracle CTEs (scoring); the sample query extends them
_DSIR_CTES = """
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
bt AS (
  SELECT t.doc_id, CAST(('0x' || substr(md5(t.token), 1, 8)) AS BIGINT) % 4096 AS b,
         d.lang
  FROM tok t JOIN documents d USING (doc_id)),
rh AS (SELECT b, COUNT(*) AS rc FROM bt GROUP BY b),
th AS (SELECT b, COUNT(*) AS tc FROM bt WHERE lang = 'en' GROUP BY b),
tot AS (SELECT (SELECT COUNT(*) FROM bt) AS rn,
               (SELECT COUNT(*) FROM bt WHERE lang = 'en') AS tn),
ratio AS (
  SELECT rh.b,
         ln((COALESCE(th.tc, 0) + 1.0) / (tot.tn + 4096))
         - ln((rh.rc + 1.0) / (tot.rn + 4096)) AS lr
  FROM rh LEFT JOIN th ON rh.b = th.b CROSS JOIN tot),
pd AS (SELECT doc_id, b, COUNT(*) AS c FROM bt GROUP BY 1, 2),
dsir AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         ROUND(SUM(c * lr), 6) AS log_weight
  FROM pd JOIN ratio USING (b) GROUP BY doc_id)
""".strip()

register(
    "q_corpus_dsir",
    _dsir_q,
    _q_docs(f", {_DSIR_CTES}\nSELECT doc_id, n_tokens, log_weight FROM dsir"),
)


def _ingest_dsir_model_q(s: SparkSession, d: str) -> DataFrame:
    """Incrementally-maintained DSIR model: the raw corpus arrives as
    three disjoint batches (doc_id % 3), each contributing only its own
    bucket histogram delta; consolidation + the shared ratio math must
    reproduce the direct whole-corpus dsir_log_ratio bit-for-bit
    (bucket counts and totals are additive). Dense num_buckets rows."""
    docs = _docs(s, d)
    deltas = None
    for i in range(3):
        h = (
            textstats._dsir_buckets(
                docs.filter(F.col("doc_id") % 3 == i), 4096, "doc_id", "text"
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("rc"))
        )
        deltas = h if deltas is None else deltas.unionByName(h)
    raw_hist = deltas.groupBy("b").agg(F.sum("rc").alias("rc"))
    tgt_hist = (
        textstats._dsir_buckets(
            docs.filter(F.col("lang") == "en"), 4096, "doc_id", "text"
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    return textstats.dsir_log_ratio_from_hists(s, raw_hist, tgt_hist, 4096).select(
        "b", F.round("lr", 6).alias("lr")
    )


register(
    "q_ingest_dsir_model",
    _ingest_dsir_model_q,
    _q_docs(
        """
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        bt AS (
          SELECT t.doc_id, CAST(('0x' || substr(md5(t.token), 1, 8)) AS BIGINT) % 4096 AS b,
                 d.lang
          FROM tok t JOIN documents d USING (doc_id)),
        rh AS (SELECT b, COUNT(*) AS rc FROM bt GROUP BY b),
        th AS (SELECT b, COUNT(*) AS tc FROM bt WHERE lang = 'en' GROUP BY b),
        tot AS (SELECT (SELECT COUNT(*) FROM bt) AS rn,
                       (SELECT COUNT(*) FROM bt WHERE lang = 'en') AS tn)
        SELECT sp.b,
               ROUND(ln((COALESCE(th.tc, 0) + 1.0) / (tot.tn + 4096))
                     - ln((COALESCE(rh.rc, 0) + 1.0) / (tot.rn + 4096)), 6) AS lr
        FROM range(4096) sp(b)
        LEFT JOIN rh ON sp.b = rh.b
        LEFT JOIN th ON sp.b = th.b
        CROSS JOIN tot
        """
    ),
)


def _dsir_sample_q(s: SparkSession, d: str) -> DataFrame:
    """Gumbel-top-k DSIR resampling (log-space A-ES over the 6dp-rounded
    importance weights — a pure function of (doc_id, seed), so the draw
    value-hashes)."""
    docs = _docs(s, d)
    return textstats.dsir_sample(
        docs, docs.filter(F.col("lang") == "en"), k=100, seed=11
    )


register(
    "q_corpus_dsir_sample",
    _dsir_sample_q,
    _q_docs(
        f""", {_DSIR_CTES},
        keyed AS (
          SELECT doc_id, log_weight,
                 ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#11'), 1, 15)) AS BIGINT) + 1)
                        / 1152921504606846976.0)) - log_weight AS k
          FROM dsir)
        SELECT doc_id, log_weight, ROUND(k, 6) AS sample_key
        FROM keyed ORDER BY k, doc_id LIMIT 100
        """
    ),
)


register(
    "q_corpus_mix",
    lambda s, d: packing.mix_corpus(
        _docs(s, d), _MIX_WEIGHTS, default_fraction=_MIX_DEFAULT, seed=7
    ).select("doc_id", "source"),
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_SAMPLE_BUCKET} < {_MIX_CASE}
    """,
)


# similarity search (4 tables × 4 planes, matching the Spark call below)
_PLANES = simsearch.hyperplanes(num_planes=16, dim=64, seed=123)
_PLANES_VALUES = ", ".join(
    f"({i // 4}, {i % 4}, [{', '.join(repr(x) for x in row)}])"
    for i, row in enumerate(_PLANES)
)
_COS = (
    "ROUND(SUM(a.v[t.i] * b.v[t.i]) / "
    "(SQRT(SUM(a.v[t.i] * a.v[t.i])) * SQRT(SUM(b.v[t.i] * b.v[t.i]))), 6)"
)

register(
    "q_dedup_embedding_lsh",
    lambda s, d: dedup.embedding_neardup_lsh(
        _ref(s, d).embeddings, threshold=0.4, num_planes=4, num_tables=4, seed=123
    ),
    _q_vec(
        f"""
        , planes(tid, pid, pv) AS (VALUES {_PLANES_VALUES}),
        dots AS (
          SELECT v.vec_id, p.tid, p.pid, SUM(v.v[t.i] * p.pv[t.i]) AS d
          FROM vec v, planes p, range(1, 65) t(i)
          GROUP BY 1, 2, 3),
        buckets AS (
          SELECT vec_id, tid,
                 CAST(SUM(CASE WHEN d >= 0 THEN (1 << pid) ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id, tid),
        cand AS (
          SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
          FROM buckets l
          JOIN buckets r ON l.tid = r.tid AND l.bucket = r.bucket AND l.vec_id < r.vec_id),
        pairs AS (
          SELECT cand.id_a, cand.id_b, {_COS} AS similarity
          FROM cand
          JOIN vec a ON a.vec_id = cand.id_a
          JOIN vec b ON b.vec_id = cand.id_b
          CROSS JOIN range(1, 65) t(i)
          GROUP BY 1, 2)
        SELECT id_a, id_b, similarity FROM pairs WHERE similarity >= 0.4
        """
    ),
)
register(
    "q_simsearch_topk",
    lambda s, d: simsearch.topk_bruteforce(
        _ref(s, d).embeddings.filter(F.col("vec_id") < 10), _ref(s, d).embeddings, k=10
    ),
    _q_vec(
        f"""
        , pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, similarity FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY similarity DESC, neighbor_id) AS rn
          FROM pairs) WHERE rn <= 10
        """
    ),
)
register(
    "q_simsearch_lsh",
    lambda s, d: simsearch.topk_hyperplane_lsh(
        _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
        _ref(s, d).embeddings,
        k=10,
        num_planes=4,
        num_tables=4,
        seed=123,
        dim=64,  # known testdata embedding width: no dim-probe job
    ),
    _q_vec(
        f"""
        , planes(tid, pid, pv) AS (VALUES {_PLANES_VALUES}),
        dots AS (
          SELECT v.vec_id, p.tid, p.pid, SUM(v.v[t.i] * p.pv[t.i]) AS d
          FROM vec v, planes p, range(1, 65) t(i)
          GROUP BY 1, 2, 3),
        buckets AS (
          SELECT vec_id, tid,
                 CAST(SUM(CASE WHEN d >= 0 THEN (1 << pid) ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id, tid),
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM buckets q
          JOIN buckets c ON q.tid = c.tid AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 10),
        pairs AS (
          SELECT cand.query_id, cand.neighbor_id, {_COS} AS similarity
          FROM cand
          JOIN vec a ON a.vec_id = cand.query_id
          JOIN vec b ON b.vec_id = cand.neighbor_id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, similarity FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY similarity DESC, neighbor_id) AS rn
          FROM pairs) WHERE rn <= 10
        """
    ),
)

# multimodal (metadata path is native + oracle-checked; the decoder,
# resize and frame kernels additionally get value-hash digests via
# q_multimodal_{features,resize,frames}_digest below — the raw binary
# outputs here stay rows-only)
register(
    "q_multimodal_meta",
    lambda s, d: multimodal.asset_meta(multimodal.assets_from_documents(_docs(s, d))),
    # image/audio payloads are real fixed-geometry containers
    # (operators/multimodal.py: 8x8 P6 PPM = 11B header + 192B raster;
    # 8-bit mono WAV = 44B header + 256B data), so their n_bytes are the
    # format constants; text stays the raw utf-8 length
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'text'
                WHEN doc_id % 3 = 1 THEN 'image'
                ELSE 'audio' END AS kind,
           CAST(CASE WHEN doc_id % 3 = 0 THEN octet_length(encode(text))
                     WHEN doc_id % 3 = 1 THEN 203
                     ELSE 300 END AS BIGINT) AS n_bytes
    FROM documents
    """,
)
register(
    "q_multimodal_features",
    lambda s, d: multimodal.extract_features(
        multimodal.assets_from_documents(_docs(s, d))
    ),
    None,
)
register(
    "q_multimodal_resize",
    # rows-only: fixed-size payload contract is unit-pinned; binary
    # payloads aren't SQL-comparable
    lambda s, d: multimodal.resize_images(
        multimodal.assets_from_documents(_docs(s, d)), width=16, height=16
    ),
    None,
)
register(
    "q_multimodal_frames",
    # rows-only: binary frame payloads aren't SQL-comparable; the 1->N
    # mapInPandas expansion contract is unit-pinned instead
    lambda s, d: multimodal.sample_frames(
        multimodal.assets_from_documents(_docs(s, d)), every_n_bytes=256, max_frames=4
    ),
    None,
)

# events (batch twins of the streaming operators; epoch-us outputs are
# session-timezone-proof)
register(
    "q_events_tumbling",
    lambda s, d: events.tumbling_counts(_ref(s, d).events, minutes=60),
    """
    SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
register(
    "q_events_sliding",
    lambda s, d: events.sliding_counts(_ref(s, d).events, width_minutes=60, slide_minutes=30),
    """
    WITH exploded AS (
      SELECT (epoch_us(ts) - epoch_us(ts) % 1800000000) - t.i * 1800000000 AS window_start_us,
             event_type, value, epoch_us(ts) AS ts_us
      FROM events CROSS JOIN range(0, 2) t(i))
    SELECT window_start_us, event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
    FROM exploded
    WHERE ts_us >= window_start_us AND ts_us < window_start_us + 3600000000
    GROUP BY 1, 2
    """,
)
register(
    "q_events_sessionize",
    lambda s, d: events.sessionize(_ref(s, d).events, gap_minutes=30),
    """
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sid AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged)
    SELECT user_id, MIN(ts_us) AS session_start_us, COUNT(*) AS n_events,
           ROUND((MAX(ts_us) - MIN(ts_us)) / 1000000.0, 6) AS duration_s
    FROM sid GROUP BY user_id, session_seq
    """,
)
register(
    "q_events_dedup",
    lambda s, d: events.dedup_events(_ref(s, d).events),
    """
    SELECT event_id, ts_us, user_id, event_type, value FROM (
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def _events_asof(s: SparkSession, d: str) -> DataFrame:
    """As-of join: each 'purchase' event picks up the user's most recent
    'view' event at-or-before it (point-in-time feature attach)."""
    from .operators.asof import asof_join

    ev = _ref(s, d).events
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"), "value"
    )
    out = asof_join(left, right, key="user_id", right_cols=["view_event_id", "value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("r_view_event_id").alias("view_event_id"),
        F.round(F.col("r_value"), 6).alias("view_value"),
    )


def _events_range_join(s: SparkSession, d: str) -> DataFrame:
    """Keyless time-window join: every (purchase, click) pair corpus-wide
    within ±300 s, via the binned range join (equi-join on a manufactured
    time bin — never the broadcast nested loop Spark would plan for the
    raw theta predicate)."""
    from .operators.rangejoin import interval_bin_join

    ev = _ref(s, d).events
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts"
    )
    out = interval_bin_join(left, right, window_us=300_000_000)
    return out.select("purchase_id", "click_id", "dt_us")


register(
    "q_events_range_join",
    _events_range_join,
    """
    SELECT l.event_id AS purchase_id, r.event_id AS click_id,
           epoch_us(r.ts) - epoch_us(l.ts) AS dt_us
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') l,
         (SELECT event_id, ts FROM events WHERE event_type = 'click') r
    WHERE abs(epoch_us(r.ts) - epoch_us(l.ts)) <= 300000000
    """,
)


def _events_asof_forward(s: SparkSession, d: str) -> DataFrame:
    """Forward as-of: each 'purchase' picks up the user's NEXT 'view' at-
    or-after it. Oracle is DuckDB's native ASOF JOIN with a <= condition —
    an independent implementation, not the same merged-window trick."""
    from .operators.asof import asof_join

    ev = _ref(s, d).events
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"), "value"
    )
    out = asof_join(
        left, right, key="user_id", right_cols=["view_event_id", "value"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("r_view_event_id").alias("view_event_id"),
        F.round(F.col("r_value"), 6).alias("view_value"),
    )


register(
    "q_events_asof_forward",
    _events_asof_forward,
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    r AS (SELECT user_id, ts, event_id AS view_event_id, value
          FROM events WHERE event_type = 'view')
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           r.view_event_id, ROUND(r.value, 6) AS view_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)

register(
    "q_events_asof",
    _events_asof,
    """
    WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
               FROM events WHERE event_type = 'purchase'),
    r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS view_event_id, value
          FROM events WHERE event_type = 'view'),
    merged AS (
      SELECT user_id, ts_us, 1 AS is_left, event_id,
             NULL::BIGINT AS view_event_id, NULL::DOUBLE AS value
      FROM l
      UNION ALL
      SELECT user_id, ts_us, 0 AS is_left, NULL::BIGINT AS event_id,
             view_event_id, value
      FROM r),
    carried AS (
      SELECT *,
             last_value(view_event_id IGNORE NULLS) OVER w AS v_id,
             last_value(value IGNORE NULLS) OVER w AS v_val
      FROM merged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, is_left
                   ROWS UNBOUNDED PRECEDING))
    SELECT event_id, user_id, ts_us, v_id AS view_event_id,
           ROUND(v_val, 6) AS view_value
    FROM carried WHERE is_left = 1
    """,
)
register(
    "q_events_conversions",
    lambda s, d: events.event_conversions(_ref(s, d).events),
    """
    SELECT c.user_id,
           c.event_id AS first_event_id,
           p.event_id AS then_event_id,
           epoch_us(c.ts) AS first_us,
           epoch_us(p.ts) AS then_us
    FROM events c JOIN events p ON c.user_id = p.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND epoch_us(p.ts) > epoch_us(c.ts)
      AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
    """,
)
register(
    "q_events_percentiles",
    lambda s, d: events.value_percentiles(_ref(s, d).events),
    """
    SELECT event_type, COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
register(
    "q_events_approx_percentiles",
    # rows-only: the sketch returns an actual data value near each true
    # quantile (accuracy-dependent); pytest brackets it between exact
    # quantiles; q_events_approx_bounds is the driver-attestable twin
    lambda s, d: events.approx_value_percentiles(_ref(s, d).events),
    None,
)
register(
    "q_events_rollup",
    lambda s, d: events.daily_rollup(_ref(s, d).events),
    """
    SELECT (epoch_us(ts) - epoch_us(ts) % 86400000000) AS day_us,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
    FROM events
    GROUP BY ROLLUP (day_us, event_type)
    """,
)
register(
    "q_events_analytics",
    lambda s, d: events.user_event_analytics(_ref(s, d).events, top_per_user=3),
    """
    SELECT user_id, event_id, value, value_rank, prev_delta, event_seq FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
             ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS prev_delta,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS event_seq
      FROM events)
    WHERE value_rank <= 3
    """,
)
register(
    "q_events_distinct_users",
    lambda s, d: events.distinct_users(_ref(s, d).events),
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
# HLL sketches are engine-specific — rows-only; accuracy pinned in pytest
# and driver-attested via q_events_approx_users_bounds
register(
    "q_events_approx_users",
    lambda s, d: events.approx_distinct_users(_ref(s, d).events),
    None,
)
register(
    "q_events_json",
    lambda s, d: events.json_props_stats(_ref(s, d).events),
    """
    SELECT event_type, COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
    FROM events GROUP BY event_type
    """,
)


# --- algorithm pipeline (G1/G2/G3) — rows-only checks -----------------------
# FastRP embeddings and label-propagation community ids are not
# SQL-expressible (iterative programs; ids value-unstable by nature, see
# SURVEY.md §5), so these entries deliberately have no oracle twin: the
# driver records the weaker rows-only check and pytest asserts invariants
# (tests/test_algorithms.py).

_PIPELINE_CACHE: dict[str, object] = {}


def reset_caches() -> None:
    """Drop the registry-level memoization (pipeline/Louvain results).

    Used by bench.py between its two measurement passes so pass 2 re-pays
    every stage's compute under a warm JVM instead of reading pass 1's
    cached DataFrames — min(pass1, pass2) is then a steady-state number a
    single fresh re-run can reproduce, not a cache-hit artifact. Callers
    should pair this with ``spark.catalog.clearCache()`` to also drop the
    plan-keyed ``.cache()`` tables the stages pinned.
    """
    _PIPELINE_CACHE.clear()
    _LOUVAIN_CACHE.clear()
    _BPE_CACHE.clear()
    _ALS_CACHE.clear()
    _QCLF_CACHE.clear()
    _HOLDOUT_CACHE.clear()


def _pipeline(spark: SparkSession, sf_dir: str):
    from .plans.pipeline import run_pipeline

    # keyed by context too: cached DataFrames die with their context, and
    # the driver may hand us a fresh one (applicationId is unique per
    # context; id(spark) could be reused after GC)
    key = (spark.sparkContext.applicationId, sf_dir)
    res = _PIPELINE_CACHE.get(key)
    if res is None:
        # knn_cutoff 0.6 instead of the reference's 0.8: FastRP cosines over
        # the synthetic uniform rating graph concentrate around 0.6-0.7
        # (top-20 median 0.64), so 0.8 keeps ~6 edges in 1500 users. The API
        # default stays 0.8 for reference parity.
        res = run_pipeline(spark, sf_dir, knn_cutoff=0.6)
        res.similar_to = res.similar_to.cache()
        # defer the community stage instead of forcing it here: the
        # reference computes communities in a SEPARATE script
        # (Alg_Community_Detection.py:53-60), so charging LPA to every
        # similar_to consumer misstated the KNN flow's cost. First
        # community consumer triggers it; the cache() still makes later
        # consumers read the pinned table.
        orig_fn = res._communities_fn

        def _cached_communities():
            comm, mod = orig_fn()
            return comm.cache(), mod

        res._communities_fn = _cached_communities
        _PIPELINE_CACHE[key] = res
    return res


def _users_with_pipeline_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ref(spark, sf_dir).users.join(
        _pipeline(spark, sf_dir).communities, "user_id", "left"
    )


def _fastrp_embeddings_flat(s: SparkSession, d: str) -> DataFrame:
    """FastRP embeddings in driver-canonicalizable shape.

    The pipeline API keeps ``(node_id, embedding array<double>)`` for
    run_pipeline callers (reference parity: gds.fastRP.mutate writes a
    vector property — Alg_KNN_FastRP.py:118-127), but the driver's
    pandas canonicalizer cannot sort an array column, so the registered
    query posexplodes to one scalar row per (node_id, dim). Values are
    rounded so the check tolerates last-ulp float noise without hiding a
    real regression.
    """
    emb = _pipeline(s, d).embeddings
    (id_col,) = [c for c in emb.columns if c != "embedding"]
    return emb.select(
        id_col, F.posexplode("embedding").alias("dim", "value")
    ).withColumn("value", F.round("value", 6))


register("q_pipeline_fastrp_embeddings", _fastrp_embeddings_flat, None)
register(
    "q_pipeline_similar_to",
    lambda s, d: _pipeline(s, d).similar_to,
    None,
)
register(
    "q_pipeline_communities",
    lambda s, d: _pipeline(s, d).communities,
    None,
)
def _community_stats(s: SparkSession, d: str) -> DataFrame:
    from .plans.modularity import community_stats

    return community_stats(_pipeline(s, d).communities)


register("q_pipeline_community_stats", _community_stats, None)
register(
    "q_pipeline_knn_recommend",
    lambda s, d: recommend.recommend_books_knn(
        _pipeline(s, d).similar_to, _ref(s, d).ratings, _ref(s, d).books, UID, k=10
    ),
    None,
)
register(
    "q_pipeline_comm_recommend",
    lambda s, d: recommend.recommend_books_community(
        _users_with_pipeline_community(s, d), _ref(s, d).ratings, _ref(s, d).books, UID, k=3
    ),
    None,
)
register(
    "q_pipeline_community_members",
    lambda s, d: serving.community_members(_users_with_pipeline_community(s, d)),
    None,
)


_LOUVAIN_CACHE: dict[tuple[str, str], tuple[DataFrame, float]] = {}


def _louvain(s: SparkSession, d: str) -> tuple[DataFrame, float]:
    from .plans.louvain import louvain

    key = (s.sparkContext.applicationId, d)
    res = _LOUVAIN_CACHE.get(key)
    if res is None:
        # .cache() on the same base plan as q_corating_projection: whichever
        # query runs first materializes the projection, the other reuses it
        co = corating.corating_edges(_ref(s, d).ratings).cache().select(
            F.col("u1").alias("src"),
            F.col("u2").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        # sweep budget sized for the sequential local path (plans/louvain.py):
        # 20 sweeps converge to q≈0.077 on the sf0.1 co-rating graph vs 0.056
        # at the 3-sweep budget the distributed path wanted
        comm, q = louvain(co, max_levels=2, max_sweeps=20)
        res = (comm.cache(), q)
        _LOUVAIN_CACHE[key] = res
    return res


def _louvain_communities(s: SparkSession, d: str) -> DataFrame:
    """Louvain proper (the reference's actual G1 algorithm) on the
    co-rating projection — rows-only: community ids are value-unstable."""
    comm, _ = _louvain(s, d)
    return comm.select(F.col("node_id").alias("user_id"), "community")


register("q_louvain_communities", _louvain_communities, None)


def _louvain_modularity(s: SparkSession, d: str) -> DataFrame:
    """Rounded Newman Q of the Louvain partition — the number the reference
    prints from the GDS summary (Alg_Community_Detection.py:45-50).
    Deterministic (sequential local path, pinned tie-breaks), so this one
    row is the regression tripwire for the whole Louvain stage; unlike the
    LPA pipeline's Q (which is exactly 0.0 at driver scales — LPA collapses
    to one community on the dense co-rating graph) it is a nontrivial value
    (the pipeline itself now also defaults to Louvain — VERDICT r3 item 5 —
    this standalone entry keeps attesting the algorithm in isolation).
    tests/test_algorithms.py recomputes Q over the labels in DuckDB."""
    _, q = _louvain(s, d)
    return s.createDataFrame([(float(round(q, 6)),)], "modularity double")


register("q_louvain_modularity", _louvain_modularity, None)


# --- iterative-machinery invariants (round-2 VERDICT item 2) ----------------
# LPA/Louvain labels are value-unstable, so the pipeline community queries
# are rows-only. These queries check the SAME iterative machinery against a
# full hash oracle where the output IS graph-determined:
# - connected components (gds.wcc analog; min-label = exactly the solver the
#   community/dedup plans share) vs a recursive-CTE transitive closure;
# - Newman modularity (the metric Alg_Community_Detection.py:45-50 prints)
#   under the deterministic nation-community binding vs the same formula in
#   plain SQL.


def _corating_double(s: SparkSession, d: str) -> DataFrame:
    """The Louvain/LPA input graph, shared-cache with q_corating_projection."""
    return corating.corating_edges(_ref(s, d).ratings).cache().select(
        F.col("u1").alias("src"),
        F.col("u2").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )


# weight >= 3 keeps the strong-tie subgraph: sparse enough that the SQL
# oracle's transitive closure (Σ per-component |c|²/2 rows) stays cheap,
# dense enough for a 48-component / 653-node-giant structure at sf0.01
COMPONENTS_MIN_WEIGHT = 3


def _graph_components(s: SparkSession, d: str) -> DataFrame:
    from .plans.graphs import connected_components

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return connected_components(strong).select(
        F.col("node_id").alias("user_id"), "component"
    )


# Transitive-closure min-label: reach(node, label) holds every label that can
# reach node; the `label < dst` prune is lossless (any label routed through a
# smaller node is beaten by that node's own label downstream).
_COMPONENTS_ORACLE = (
    f"""{ORACLE_PRELUDE},
pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
uedges AS (
  SELECT src, dst FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM pos a JOIN pos b USING (isbn)
    WHERE a.user_id <> b.user_id
    GROUP BY a.user_id, b.user_id)
  WHERE w >= {COMPONENTS_MIN_WEIGHT}),
reach(node, label) AS (
  SELECT src, src FROM uedges
  UNION
  SELECT e.dst, r.label
  FROM reach r JOIN uedges e ON e.src = r.node
  WHERE r.label < e.dst)
SELECT node AS user_id, MIN(label) AS component FROM reach GROUP BY node
""".replace("WITH ", "WITH RECURSIVE ", 1)
)

register("q_graph_components", _graph_components, _COMPONENTS_ORACLE)


register(
    "q_node_similarity",
    lambda s, d: corating.node_similarity_jaccard(
        _ref(s, d).ratings, cutoff=0.1, top_k=10
    ),
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        deg AS (SELECT user_id, COUNT(*) AS dg FROM pos GROUP BY user_id),
        inter AS (
          SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS w
          FROM pos a JOIN pos b USING (isbn)
          WHERE a.user_id <> b.user_id
          GROUP BY a.user_id, b.user_id),
        sim AS (
          SELECT u1, u2, ROUND(w / (da.dg + db.dg - w), 6) AS similarity
          FROM inter
          JOIN deg da ON da.user_id = u1
          JOIN deg db ON db.user_id = u2)
        SELECT u1, u2, similarity FROM (
          SELECT u1, u2, similarity,
                 ROW_NUMBER() OVER (PARTITION BY u1 ORDER BY similarity DESC, u2) AS rn
          FROM sim WHERE similarity >= 0.1)
        WHERE rn <= 10
        """
    ),
)


def _graph_triangles(s: SparkSession, d: str) -> DataFrame:
    from .plans.graphs import triangle_counts

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return triangle_counts(strong).select(
        F.col("node_id").alias("user_id"), "triangles"
    )


# Oracle enumerates each triangle once as a < b < c; the Spark plan's
# degree-ordered orientation must produce the identical per-node counts.
_TRIANGLES_ORACLE = f"""{ORACLE_PRELUDE},
pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
und AS (
  SELECT src AS a, dst AS b FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM pos a JOIN pos b USING (isbn)
    WHERE a.user_id < b.user_id
    GROUP BY a.user_id, b.user_id)
  WHERE w >= {COMPONENTS_MIN_WEIGHT}),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node AS user_id, COUNT(*) AS triangles FROM corners GROUP BY node
"""

register("q_graph_triangles", _graph_triangles, _TRIANGLES_ORACLE)


def _modularity_nation(s: SparkSession, d: str) -> DataFrame:
    from .plans.modularity import modularity

    customer = s.read.parquet(f"{d}/customer.parquet")
    labels = customer.select(
        F.col("c_custkey").alias("node_id"), F.col("c_nationkey").alias("community")
    )
    q = modularity(_corating_double(s, d), labels)
    return s.createDataFrame([(float(round(q, 6)),)], "modularity double")


_MODULARITY_NATION_ORACLE = f"""{ORACLE_PRELUDE},
co AS (
  SELECT a.user_id AS src, b.user_id AS dst, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM (SELECT user_id, isbn FROM ratings WHERE rating >= 6) a
  JOIN (SELECT user_id, isbn FROM ratings WHERE rating >= 6) b USING (isbn)
  WHERE a.user_id <> b.user_id
  GROUP BY a.user_id, b.user_id),
lab AS (SELECT c_custkey AS node_id, c_nationkey AS community FROM customer),
e AS (
  SELECT la.community AS c_src, lb.community AS c_dst, co.weight
  FROM co
  JOIN lab la ON co.src = la.node_id
  JOIN lab lb ON co.dst = lb.node_id),
percomm AS (
  SELECT c_src, SUM(weight) AS deg,
         SUM(CASE WHEN c_src = c_dst THEN weight ELSE 0 END) AS in_w
  FROM e GROUP BY c_src)
SELECT ROUND(SUM(in_w) / SUM(deg) - SUM(deg * deg) / (SUM(deg) * SUM(deg)), 6)
       AS modularity
FROM percomm
"""

register("q_modularity_nation", _modularity_nation, _MODULARITY_NATION_ORACLE)


def _conductance_nation(s: SparkSession, d: str) -> DataFrame:
    """Per-community conductance (gds.conductance analog) on the co-rating
    projection under the deterministic nation partition — the same
    label anchoring that makes q_modularity_nation value-hashable."""
    from .plans.modularity import conductance

    customer = s.read.parquet(f"{d}/customer.parquet")
    labels = customer.select(
        F.col("c_custkey").alias("node_id"), F.col("c_nationkey").alias("community")
    )
    return conductance(_corating_double(s, d), labels)


_CONDUCTANCE_NATION_ORACLE = f"""{ORACLE_PRELUDE},
co AS (
  SELECT a.user_id AS src, b.user_id AS dst, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM (SELECT user_id, isbn FROM ratings WHERE rating >= 6) a
  JOIN (SELECT user_id, isbn FROM ratings WHERE rating >= 6) b USING (isbn)
  WHERE a.user_id <> b.user_id
  GROUP BY a.user_id, b.user_id),
lab AS (SELECT c_custkey AS node_id, c_nationkey AS community FROM customer),
e AS (
  SELECT la.community AS c_src, lb.community AS c_dst, co.weight
  FROM co
  JOIN lab la ON co.src = la.node_id
  JOIN lab lb ON co.dst = lb.node_id),
percomm AS (
  SELECT c_src AS community, SUM(weight) AS volume,
         SUM(CASE WHEN c_src <> c_dst THEN weight ELSE 0 END) AS cut_weight
  FROM e GROUP BY c_src),
tot AS (SELECT SUM(volume) AS t FROM percomm)
SELECT community, ROUND(volume, 6) AS volume, ROUND(cut_weight, 6) AS cut_weight,
       ROUND(CASE WHEN LEAST(volume, t - volume) > 0
                  THEN cut_weight / LEAST(volume, t - volume)
                  ELSE 0.0 END, 6) AS conductance
FROM percomm CROSS JOIN tot
"""

register("q_graph_conductance", _conductance_nation, _CONDUCTANCE_NATION_ORACLE)


# PageRank: the one iterative algorithm whose fixed iteration count unrolls
# into plain chained CTEs, so it gets a full value-hash oracle (G1/G2 make
# do with invariant checks). 8dp rounding: cross-engine summation-order
# noise is ~1e-15 absolute and a PageRank iteration is a contraction, so it
# never amplifies into the 1e-8 quantum.
_PR_DAMPING = 0.85
_PR_ITERS = 10


def _pagerank_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.pagerank import pagerank

    pr = pagerank(_corating_double(s, d), damping=_PR_DAMPING, iters=_PR_ITERS)
    return pr.select(
        F.col("node_id").alias("user_id"), F.round("rank", 8).alias("rank")
    )


def _pagerank_oracle(iters: int, damping: float) -> str:
    ctes = [
        """edges AS (
  SELECT a.user_id AS src, b.user_id AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM (SELECT user_id, isbn FROM ratings WHERE rating >= 6) a
  JOIN (SELECT user_id, isbn FROM ratings WHERE rating >= 6) b USING (isbn)
  WHERE a.user_id <> b.user_id
  GROUP BY a.user_id, b.user_id)""",
        "wdeg AS (SELECT src, SUM(w) AS wd FROM edges GROUP BY src)",
        "trans AS (SELECT e.src, e.dst, e.w / d.wd AS p FROM edges e JOIN wdeg d USING (src))",
        "nn AS (SELECT COUNT(DISTINCT src) AS c FROM edges)",
        "pr0 AS (SELECT DISTINCT src AS node_id, 1.0 / (SELECT c FROM nn) AS rank FROM edges)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"pr{i} AS (SELECT t.dst AS node_id, "
            f"(1.0 - {damping}) / (SELECT c FROM nn) + {damping} * SUM(r.rank * t.p) AS rank "
            f"FROM trans t JOIN pr{i - 1} r ON r.node_id = t.src GROUP BY t.dst)"
        )
    body = ",\n".join(ctes)
    return _q(f", {body}\nSELECT node_id AS user_id, ROUND(rank, 8) AS rank FROM pr{iters}")


register("q_pagerank", _pagerank_q, _pagerank_oracle(_PR_ITERS, _PR_DAMPING))


def _pipeline_modularity(s: SparkSession, d: str) -> DataFrame:
    """Rounded Newman Q of the pipeline's community partition — Louvain by
    default (VERDICT r3 item 5; the reference's actual G1 algorithm), and
    deterministic (sequential local path, pinned tie-breaks), so this
    single row is a regression tripwire for the whole community stage even
    though the labels themselves can't be hash-compared.
    tests/test_algorithms.py recomputes Q over the exported labels in
    DuckDB and pins equality."""
    _ = _pipeline(s, d).communities  # force the community stage
    q = _pipeline(s, d).modularity
    return s.createDataFrame([(float(round(q, 6)),)], "modularity double")


register("q_pipeline_modularity", _pipeline_modularity, None)


def _fastrp_digest(s: SparkSession, d: str) -> DataFrame:
    """Order-independent digest of the FastRP embedding table:
    (n_values, bit_xor of per-(id,dim,value) hashes). Deterministic across
    runs (FastRP path is bit-exact, pinned by tests/test_algorithms.py),
    so a changed digest means the embedding stage regressed."""
    emb = _pipeline(s, d).embeddings
    (id_col,) = [c for c in emb.columns if c != "embedding"]
    flat = emb.select(id_col, F.posexplode("embedding").alias("dim", "value"))
    return flat.agg(
        F.count(F.lit(1)).alias("n_values"),
        F.expr(
            f"bit_xor(xxhash64(cast({id_col} as string), cast(dim as string),"
            " cast(round(value, 6) as string)))"
        ).alias("digest"),
    )


register("q_pipeline_fastrp_digest", _fastrp_digest, None)


def _simsearch_ivf(s: SparkSession, d: str) -> DataFrame:
    """IVF ANN (k-means cells + nprobe; rows-only: Lloyd means are float
    aggregation-order dependent, so cell boundaries aren't hash-stable; q_simsearch_ivf_exact is the
    driver-attestable twin — full probe provably equals brute force)."""
    from .operators.ivf import topk_ivf

    emb = _ref(s, d).embeddings
    return topk_ivf(emb.filter(F.col("vec_id") < 10), emb, k=10, nprobe=4)


register("q_simsearch_ivf", _simsearch_ivf, None)


def _simsearch_pq(s: SparkSession, d: str) -> DataFrame:
    """PQ-ADC ANN (rows-only: codebooks come from sampled k-means, not
    hash-stable across engines). m=16 subspaces × 16 centroids = 16×
    compression of the scan side; measured 0.97 recall@10 vs brute force
    at rerank=10 on the driver's near-random embeddings.
    q_simsearch_pq_exact is the driver-attestable twin (full rerank
    provably equals brute force)."""
    from .operators.pq import topk_pq

    emb = _ref(s, d).embeddings
    return topk_pq(emb.filter(F.col("vec_id") < 10), emb, k=10, m=16, rerank=10)


register("q_simsearch_pq", _simsearch_pq, None)


# streaming packing contract, driver-attestable (VERDICT r2 item 7): run
# the actual applyInPandasWithState pack_stream to completion (availableNow
# → memory sink) and hash-verify the per-shard totals. The per-row
# (pack_id, pack_offset) coordinates depend on arrival order, but under the
# gapless-tiling contract every shard's max(pack end) equals its token sum —
# so packed_end is order-independent AND only comes out right if the
# per-shard offset state survives across micro-batches. Shards ride the
# md5 bucket (seed 7), reproducible in the SQL twin.
_STREAM_PACK_CTX = 512
_STREAM_PACK_SHARDS = 8


def _stream_pack_totals(s: SparkSession, d: str) -> DataFrame:
    import tempfile
    import uuid

    from .streaming import events as stream_ops

    packed = stream_ops.run_to_memory(
        stream_ops.pack_stream(
            stream_ops.read_documents_stream(s, d),
            ctx_len=_STREAM_PACK_CTX,
            n_shards=_STREAM_PACK_SHARDS,
            seed=7,
        ),
        f"t_stream_pack_totals_{uuid.uuid4().hex[:8]}",
        "append",
        tempfile.mkdtemp(prefix="ck_stream_pack_totals_"),
    )
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max(
            F.col("pack_id") * _STREAM_PACK_CTX
            + F.col("pack_offset")
            + F.col("n_tokens")
        ).alias("packed_end"),
    )


register(
    "q_stream_pack_totals",
    _stream_pack_totals,
    _q_docs(
        f"""
        , tok AS (SELECT doc_id, CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens FROM norm)
        SELECT CAST(({_SAMPLE_BUCKET}) % {_STREAM_PACK_SHARDS} AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_tokens) AS BIGINT) AS packed_end
        FROM tok GROUP BY 1
        """
    ),
)


# Gopher-style intra-document repetition signals (Rae et al. 2021) — the
# rule family a corpus quality filter thresholds on
register(
    "q_text_repetition",
    lambda s, d: textstats.repetition_scores(_docs(s, d)),
    _q_docs(
        """
        , tok AS (SELECT doc_id, t, len(t) AS n FROM toks),
        g AS (SELECT doc_id, n,
                     unnest([array_to_string(list_slice(t, i, i + 1), ' ')
                             for i in range(1, greatest(len(t) - 1, 1) + 1)]) AS gram
              FROM tok),
        gc AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY doc_id, n, gram),
        gs AS (SELECT doc_id, n, MAX(c) AS maxg, SUM(c) AS totg,
                      SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupg
               FROM gc GROUP BY doc_id, n),
        tk AS (SELECT doc_id, unnest(t) AS token FROM toks),
        tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tk GROUP BY doc_id, token),
        ts AS (SELECT doc_id, MAX(c) AS maxt, SUM(c) AS tott FROM tc GROUP BY doc_id)
        SELECT gs.doc_id, CAST(gs.n AS BIGINT) AS n_tokens,
               ROUND(CAST(ts.maxt AS DOUBLE) / ts.tott, 6) AS top_token_fraction,
               ROUND(CAST(gs.maxg AS DOUBLE) / gs.totg, 6) AS top_2gram_fraction,
               ROUND(CAST(gs.dupg AS DOUBLE) / gs.totg, 6) AS dup_2gram_fraction
        FROM gs JOIN ts USING (doc_id)
        """
    ),
)


# radius similarity search: "everything at least this similar", the
# complement of the top-k operators (corpus scan never shuffles)
register(
    "q_simsearch_range",
    lambda s, d: simsearch.range_search(
        _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
        _ref(s, d).embeddings,
        radius=0.35,
    ),
    _q_vec(
        f"""
        SELECT query_id, neighbor_id, similarity FROM (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2)
        WHERE similarity >= 0.35
        """
    ),
)


def _semantic_decontaminate_q(s: SparkSession, d: str) -> DataFrame:
    """Embedding-space decontamination over the same deterministic 10%
    eval split as q_corpus_decontaminate (md5-bucket < 100k, seed 33),
    here on vec_id: nearest-eval cosine per training embedding.
    Threshold 0.35 is fixture-calibrated (cross-split max-sims span
    ~0.16-0.49 in this corpus), exercising both flag values."""
    from .operators.sampling import sample_bucket

    emb = _ref(s, d).embeddings
    b = sample_bucket("vec_id", seed=33)
    return dedup.semantic_decontaminate(
        emb.filter(b >= 100_000), emb.filter(b < 100_000), threshold=0.35
    )


register(
    "q_corpus_semantic_decontaminate",
    _semantic_decontaminate_q,
    _q_vec(
        f"""
        , bkt AS (
          SELECT vec_id, v,
                 CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '#33'), 1, 8)) AS BIGINT)
                 % 1000000 AS bk
          FROM vec),
        sims AS (
          SELECT a.vec_id AS doc_id, {{_COS}} AS s
          FROM bkt a, bkt b, range(1, 65) t(i)
          WHERE a.bk >= 100000 AND b.bk < 100000
          GROUP BY a.vec_id, b.vec_id)
        SELECT doc_id, MAX(s) AS max_eval_sim, MAX(s) >= 0.35 AS contaminated
        FROM sims GROUP BY doc_id
        """.replace("{_COS}", _COS)
    ),
)


# Adamic-Adar node similarity: the rarity-weighted companion of
# q_node_similarity (GDS link-prediction scorer over the same projection)
register(
    "q_node_similarity_aa",
    lambda s, d: corating.node_similarity_adamic_adar(_ref(s, d).ratings, top_k=10),
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        ideg AS (SELECT isbn, COUNT(*) AS dg FROM pos GROUP BY isbn HAVING COUNT(*) >= 2),
        sim AS (
          SELECT a.user_id AS u1, b.user_id AS u2,
                 ROUND(SUM(1.0 / ln(d.dg)), 6) AS score
          FROM pos a
          JOIN ideg d USING (isbn)
          JOIN pos b USING (isbn)
          WHERE a.user_id <> b.user_id
          GROUP BY a.user_id, b.user_id)
        SELECT u1, u2, score FROM (
          SELECT u1, u2, score,
                 ROW_NUMBER() OVER (PARTITION BY u1 ORDER BY score DESC, u2) AS rn
          FROM sim)
        WHERE rn <= 10
        """
    ),
)


# cohort retention matrix over events (first-activity-day cohorts)
register(
    "q_events_retention",
    lambda s, d: events.cohort_retention(_ref(s, d).events, max_day_offset=35),
    """
    WITH acts AS (
      SELECT DISTINCT user_id,
             (epoch_us(ts) - epoch_us(ts) % 86400000000) AS day_us
      FROM events),
    first AS (
      SELECT user_id, MIN(day_us) AS cohort_day_us FROM acts GROUP BY user_id),
    sizes AS (
      SELECT cohort_day_us, CAST(COUNT(*) AS BIGINT) AS n_cohort
      FROM first GROUP BY cohort_day_us),
    ret AS (
      SELECT f.cohort_day_us,
             (a.day_us - f.cohort_day_us) // 86400000000 AS day_offset,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM acts a JOIN first f USING (user_id)
      WHERE (a.day_us - f.cohort_day_us) // 86400000000 <= 35
      GROUP BY 1, 2)
    SELECT r.cohort_day_us, r.day_offset, r.n_active, s.n_cohort,
           ROUND(CAST(r.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
    FROM ret r JOIN sizes s USING (cohort_day_us)
    """,
)


# personalized PageRank: teleport mass on a seed user set — proximity-to-
# seeds centrality (the "recommend around these users" variant). Same
# exchange-free round as q_pagerank; unrolled-CTE oracle likewise.
_PPR_SOURCES = [1, 2, 3]


def _ppr_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.pagerank import pagerank

    pr = pagerank(
        _corating_double(s, d),
        damping=_PR_DAMPING,
        iters=_PR_ITERS,
        sources=_PPR_SOURCES,
    )
    return pr.select(
        F.col("node_id").alias("user_id"), F.round("rank", 8).alias("rank")
    )


def _ppr_oracle(iters: int, damping: float, sources: list[int]) -> str:
    src_list = ", ".join(str(x) for x in sources)
    k = len(sources)
    ctes = [
        """edges AS (
  SELECT a.user_id AS src, b.user_id AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM (SELECT user_id, isbn FROM ratings WHERE rating >= 6) a
  JOIN (SELECT user_id, isbn FROM ratings WHERE rating >= 6) b USING (isbn)
  WHERE a.user_id <> b.user_id
  GROUP BY a.user_id, b.user_id)""",
        "wdeg AS (SELECT src, SUM(w) AS wd FROM edges GROUP BY src)",
        "trans AS (SELECT e.src, e.dst, e.w / d.wd AS p FROM edges e JOIN wdeg d USING (src))",
        f"pr0 AS (SELECT DISTINCT src AS node_id, CASE WHEN src IN ({src_list})"
        f" THEN 1.0 / {k} ELSE 0.0 END AS rank FROM edges)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"pr{i} AS (SELECT t.dst AS node_id, "
            f"CASE WHEN t.dst IN ({src_list}) THEN (1.0 - {damping}) / {k} ELSE 0.0 END"
            f" + {damping} * SUM(r.rank * t.p) AS rank "
            f"FROM trans t JOIN pr{i - 1} r ON r.node_id = t.src GROUP BY t.dst)"
        )
    body = ",\n".join(ctes)
    return _q(f", {body}\nSELECT node_id AS user_id, ROUND(rank, 8) AS rank FROM pr{iters}")


register("q_ppr", _ppr_q, _ppr_oracle(_PR_ITERS, _PR_DAMPING, _PPR_SOURCES))


# per-label embedding centroids (class means in long form)
register(
    "q_emb_centroids",
    lambda s, d: simsearch.label_centroids(_ref(s, d).embeddings),
    """
    SELECT label, CAST(t.i - 1 AS INT) AS dim,
           ROUND(AVG(CAST(embedding[t.i] AS DOUBLE)), 6) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, t.i
    """,
)


# overlap-coefficient node similarity (GDS similarityMetric: OVERLAP)
register(
    "q_node_similarity_overlap",
    lambda s, d: corating.node_similarity_overlap(
        _ref(s, d).ratings, cutoff=0.1, top_k=10
    ),
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        deg AS (SELECT user_id, COUNT(*) AS dg FROM pos GROUP BY user_id),
        inter AS (
          SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS w
          FROM pos a JOIN pos b USING (isbn)
          WHERE a.user_id <> b.user_id
          GROUP BY a.user_id, b.user_id),
        sim AS (
          SELECT u1, u2, ROUND(CAST(w AS DOUBLE) / least(da.dg, db.dg), 6) AS similarity
          FROM inter
          JOIN deg da ON da.user_id = u1
          JOIN deg db ON db.user_id = u2)
        SELECT u1, u2, similarity FROM (
          SELECT u1, u2, similarity,
                 ROW_NUMBER() OVER (PARTITION BY u1 ORDER BY similarity DESC, u2) AS rn
          FROM sim WHERE similarity >= 0.1)
        WHERE rn <= 10
        """
    ),
)


# eigenvector centrality (GDS gds.eigenvector): power iteration with L2
# normalization, unrolled-CTE oracle — the third hash-verified iterative
# algorithm (after weighted PageRank and personalized PageRank)
_EV_ITERS = 10


def _eigenvector_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.eigenvector import eigenvector_centrality

    ev = eigenvector_centrality(_corating_double(s, d), iters=_EV_ITERS)
    return ev.select(
        F.col("node_id").alias("user_id"), F.round("score", 8).alias("score")
    )


def _eigenvector_oracle(iters: int) -> str:
    ctes = [
        """edges AS (
  SELECT a.user_id AS src, b.user_id AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM (SELECT user_id, isbn FROM ratings WHERE rating >= 6) a
  JOIN (SELECT user_id, isbn FROM ratings WHERE rating >= 6) b USING (isbn)
  WHERE a.user_id <> b.user_id
  GROUP BY a.user_id, b.user_id)""",
        "nn AS (SELECT COUNT(DISTINCT src) AS c FROM edges)",
        "x0 AS (SELECT DISTINCT src AS node_id, 1.0 / sqrt((SELECT c FROM nn)) AS score FROM edges)",
    ]
    for i in range(1, iters + 1):
        # y{i} MUST be MATERIALIZED: x{i} references it twice (directly and
        # through the norm scalar), and inlining would re-expand the whole
        # chain 2^iters times — the query never finishes without it
        ctes.append(
            f"y{i} AS MATERIALIZED (SELECT e.dst AS node_id, SUM(e.w * x.score) AS y "
            f"FROM edges e JOIN x{i - 1} x ON x.node_id = e.src GROUP BY e.dst)"
        )
        ctes.append(f"n{i} AS (SELECT sqrt(SUM(y * y)) AS nrm FROM y{i})")
        ctes.append(
            f"x{i} AS (SELECT node_id, y / (SELECT nrm FROM n{i}) AS score FROM y{i})"
        )
    body = ",\n".join(ctes)
    return _q(
        f", {body}\nSELECT node_id AS user_id, ROUND(score, 8) AS score FROM x{iters}"
    )


register("q_eigenvector", _eigenvector_q, _eigenvector_oracle(_EV_ITERS))


def _corpus_cluster(s: SparkSession, d: str) -> DataFrame:
    """Distributed k-means over the corpus embedding space (rows-only:
    Lloyd means are float-aggregation-order dependent, so cluster
    boundaries aren't hash-stable; invariants pinned in
    tests/test_pipeline_ops.py; q_corpus_cluster_assign is the driver-
    attestable twin of the assignment kernel)."""
    from .operators.ivf import cluster_corpus

    return cluster_corpus(_ref(s, d).embeddings, k=16, lloyd_iters=4)


register("q_corpus_cluster", _corpus_cluster, None)


# ordered 3-step funnel (view -> click -> purchase): per-user earliest
# qualifying chain; the multi-step companion of q_events_conversions'
# 2-step interval join
register(
    "q_events_funnel",
    lambda s, d: events.funnel(_ref(s, d).events, steps=("view", "click", "purchase")),
    """
    WITH s1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS step1_us
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS step2_us
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.step1_us
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS step3_us
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.step2_us
      GROUP BY e.user_id)
    SELECT s1.user_id, s1.step1_us, s2.step2_us, s3.step3_us,
           1 + CAST(s2.step2_us IS NOT NULL AS INT)
             + CAST(s3.step3_us IS NOT NULL AS INT) AS reached
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
)


# per-type z-score outliers over event values (two-pass: tiny stats
# aggregate broadcast back onto the scan)
register(
    "q_events_anomaly",
    lambda s, d: events.value_anomalies(_ref(s, d).events, z=3.0),
    """
    WITH st AS (
      SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - st.m) / st.sd, 6) AS zscore
    FROM events e JOIN st USING (event_type)
    WHERE ABS((e.value - st.m) / st.sd) > 3.0
    """,
)


# character-bigram LM typicality scoring (CCNet-style quality proxy)
register(
    "q_text_lm_score",
    lambda s, d: textstats.lm_bigram_scores(_docs(s, d)),
    _q_docs(
        """
        , base AS (SELECT doc_id, norm FROM norm WHERE length(norm) >= 2),
        grams AS (
          SELECT doc_id, unnest([substr(norm, i, 2) for i in range(1, length(norm))]) AS bigram
          FROM base),
        big AS (SELECT bigram, COUNT(*) AS cnt FROM grams GROUP BY bigram),
        pre AS (SELECT substr(bigram, 1, 1) AS c1, SUM(cnt) AS tot FROM big GROUP BY 1),
        model AS (
          SELECT bigram, log2(CAST(cnt AS DOUBLE) / tot) AS lp
          FROM big JOIN pre ON substr(big.bigram, 1, 1) = pre.c1)
        SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(lp), 6) AS lm_score
        FROM grams JOIN model USING (bigram)
        GROUP BY doc_id
        """
    ),
)


# exact histogram-quantile length filter: drop the shortest quartile by
# token count — integer threshold, no percentile interpolation
register(
    "q_text_length_filter",
    lambda s, d: textstats.length_quantile_keep(_docs(s, d), q=0.25),
    _q_docs(
        """
        , tc AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
        hist AS (SELECT n_tokens, COUNT(*) AS c FROM tc GROUP BY n_tokens),
        cum AS (
          SELECT n_tokens,
                 SUM(c) OVER (ORDER BY n_tokens ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(c) OVER () AS n
          FROM hist),
        th AS (SELECT MIN(n_tokens) AS t FROM cum WHERE cum >= CEILING(0.25 * n))
        SELECT doc_id, n_tokens FROM tc, th WHERE n_tokens >= th.t
        """
    ),
)


# k-core decomposition of the co-rating graph (k=60: nonempty, multi-round
# peel at both test scales — 142 survivors @sf0.001, 1474 @sf0.01). The
# oracle unrolls 8 peel rounds (fixpoint observed at <=4); every cur{i}
# MUST be MATERIALIZED — each round references the previous one twice
# (src IN + dst IN), so inlining would blow up 2^rounds like the
# eigenvector oracle did.
_KCORE_K = 60
_KCORE_ROUNDS = 8


def _kcore_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.graphs import k_core

    return k_core(_corating_double(s, d), k=_KCORE_K).select(
        F.col("node_id").alias("user_id"), "core_degree"
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    ctes = [
        """edges AS MATERIALIZED (
  SELECT a.user_id AS src, b.user_id AS dst
  FROM (SELECT user_id, isbn FROM ratings WHERE rating >= 6) a
  JOIN (SELECT user_id, isbn FROM ratings WHERE rating >= 6) b USING (isbn)
  WHERE a.user_id <> b.user_id
  GROUP BY 1, 2)""",
        f"cur0 AS MATERIALIZED (SELECT src AS node FROM edges GROUP BY src HAVING COUNT(*) >= {k})",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"cur{i} AS MATERIALIZED (SELECT src AS node FROM edges "
            f"WHERE src IN (SELECT node FROM cur{i - 1}) AND dst IN (SELECT node FROM cur{i - 1}) "
            f"GROUP BY src HAVING COUNT(*) >= {k})"
        )
    body = ",\n".join(ctes)
    return _q(
        f""", {body}
SELECT src AS user_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM edges
WHERE src IN (SELECT node FROM cur{rounds}) AND dst IN (SELECT node FROM cur{rounds})
GROUP BY src"""
    )


register("q_graph_kcore", _kcore_q, _kcore_oracle(_KCORE_K, _KCORE_ROUNDS))


# k-truss of the strong co-rating graph (k=3: every edge must close at
# least one triangle WITHIN the surviving subgraph — the triangle-connected
# backbone; 18 edges @sf0.01, 1738 @sf0.001, fixpoint at 2 peel rounds at
# both scales). The oracle unrolls 4 rounds with the loud-fail convergence
# assertion (e{N} must equal e{N-1} — the ADVICE r4 discipline), so a
# deeper peel at some future scale errors instead of hash-mismatching.
_KTRUSS_K = 3
_KTRUSS_ROUNDS = 4


def _ktruss_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.graphs import k_truss

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return k_truss(strong, k=_KTRUSS_K).select(
        F.col("src").alias("user_a"), F.col("dst").alias("user_b"), "support"
    )


def _ktruss_oracle(k: int, rounds: int) -> str:
    ctes = [
        """pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6)""",
        f"""e0 AS MATERIALIZED (
  SELECT a.user_id AS a, b.user_id AS b
  FROM pos a JOIN pos b USING (isbn)
  WHERE a.user_id < b.user_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {COMPONENTS_MIN_WEIGHT})""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""t{i} AS MATERIALIZED (
  SELECT x.a AS ta, x.b AS tb, y.b AS tc
  FROM e{i - 1} x JOIN e{i - 1} y ON y.a = x.a AND y.b > x.b
  JOIN e{i - 1} z ON z.a = x.b AND z.b = y.b)"""
        )
        ctes.append(
            f"""sup{i} AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS s FROM (
    SELECT ta AS a, tb AS b FROM t{i}
    UNION ALL SELECT ta, tc FROM t{i}
    UNION ALL SELECT tb, tc FROM t{i})
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT e.a, e.b, s.s FROM e{i - 1} e JOIN sup{i} s USING (a, b)
  WHERE s.s >= {k - 2})"""
        )
    body = ",\n".join(ctes)
    return _q(
        f""", {body},
conv AS (SELECT CASE WHEN (SELECT COUNT(*) FROM
                           (SELECT a, b FROM e{rounds - 1} EXCEPT SELECT a, b FROM e{rounds})) > 0
                     THEN error('k-truss oracle: peel unroll truncated at {rounds} rounds')
                     ELSE 1 END AS ok)
SELECT a AS user_a, b AS user_b, CAST(s AS BIGINT) AS support FROM e{rounds}
WHERE (SELECT ok FROM conv) = 1"""
    )


register("q_graph_ktruss", _ktruss_q, _ktruss_oracle(_KTRUSS_K, _KTRUSS_ROUNDS))


# HITS hubs & authorities on the bipartite positive-rating graph
# (users=hubs, books=authorities — the form gds.alpha.hits ships; on the
# symmetric co-rating projection HITS would collapse to q_eigenvector).
# Oracle: unrolled half-rounds; every raw CTE is MATERIALIZED because the
# norm scalar subquery references it a second time.
_HITS_ITERS = 8


def _hits_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.hits import hits

    pos = (
        _ref(s, d)
        .ratings.filter(F.col("rating") >= 6)
        .select("user_id", "isbn")
    )
    return hits(pos, iters=_HITS_ITERS)


def _hits_oracle(iters: int) -> str:
    ctes = [
        "e AS MATERIALIZED (SELECT DISTINCT user_id, isbn FROM ratings WHERE rating >= 6)",
        "h0 AS (SELECT user_id, 1.0 / sqrt((SELECT COUNT(DISTINCT user_id) FROM e)) AS s"
        " FROM (SELECT DISTINCT user_id FROM e))",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"ar{i} AS MATERIALIZED (SELECT isbn, SUM(h.s) AS s"
            f" FROM e JOIN h{i - 1} h USING (user_id) GROUP BY isbn)"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT isbn,"
            f" s / (SELECT sqrt(SUM(s * s)) FROM ar{i}) AS s FROM ar{i})"
        )
        ctes.append(
            f"hr{i} AS MATERIALIZED (SELECT user_id, SUM(a.s) AS s"
            f" FROM e JOIN a{i} a USING (isbn) GROUP BY user_id)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT user_id,"
            f" s / (SELECT sqrt(SUM(s * s)) FROM hr{i}) AS s FROM hr{i})"
        )
    body = ",\n".join(ctes)
    return _q(
        f""", {body}
SELECT 'hub' AS kind, CAST(user_id AS VARCHAR) AS id, ROUND(s, 6) AS score FROM h{iters}
UNION ALL
SELECT 'authority' AS kind, isbn AS id, ROUND(s, 6) AS score FROM a{iters}"""
    )


register("q_hits", _hits_q, _hits_oracle(_HITS_ITERS))


# Efraimidis-Spirakis weighted sampling without replacement (keys from the
# deterministic md5 hash, so the sample is a pure function of (id, seed))
register(
    "q_corpus_sample_weighted",
    lambda s, d: sampling.weighted_sample_topk(
        _docs(s, d), k=100, weight_col="n_chars", seed=7
    ),
    """
    SELECT doc_id, weight, ROUND(es_key, 6) AS es_key FROM (
      SELECT doc_id, n_chars AS weight,
             -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#7'), 1, 15)) AS BIGINT) + 1)
                 / 1152921504606846976.0) / n_chars AS es_key
      FROM documents)
    ORDER BY es_key, doc_id LIMIT 100
    """,
)


# single-source BFS hop distances on the strong co-rating graph (the
# shortest-path primitive: gds.bfs / single-source allShortestPaths).
# Oracle: bounded recursive CTE over (node, dist) pairs — UNION dedups
# pairs and the dist < bound guard terminates cycles; MIN(dist) per node
# is the BFS distance. Bound 24 > the observed 15-hop eccentricity of
# user 1 at sf0.01 (probed; sf0.001 is 4).
_BFS_BOUND = 24


def _bfs_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.graphs import bfs_distances

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return bfs_distances(strong, UID).select(
        F.col("node_id").alias("user_id"), "dist"
    )


_BFS_ORACLE = (
    f"""{ORACLE_PRELUDE},
pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
uedges AS (
  SELECT src, dst FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM pos a JOIN pos b USING (isbn)
    WHERE a.user_id <> b.user_id
    GROUP BY a.user_id, b.user_id)
  WHERE w >= {COMPONENTS_MIN_WEIGHT}),
walk(node, d) AS (
  SELECT {UID}, 0
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN uedges e ON e.src = w.node
  WHERE w.d < {_BFS_BOUND})
SELECT node AS user_id, CAST(MIN(d) AS INT) AS dist FROM walk GROUP BY node
""".replace("WITH ", "WITH RECURSIVE ", 1)
)

register("q_graph_bfs", _bfs_q, _BFS_ORACLE)


def _betweenness_q(s: SparkSession, d: str) -> DataFrame:
    """Sampled-Brandes betweenness on the strong co-rating graph. Fully
    oracle-checked since round 4: the md5 source sample, all-pairs path
    counts and the n/k-scaled pair-formula estimate are all re-expressed
    in the SQL twin below; q_graph_betweenness_exact additionally pins
    the num_sources >= n exact mode on a bounded subgraph."""
    from .plans.betweenness import betweenness_approx

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return betweenness_approx(strong, num_sources=16, seed=7).select(
        F.col("node_id").alias("user_id"), "betweenness"
    )


# Full value-hash oracle for the SAMPLED production estimator (round 4):
# the md5-hash source sample is SQL-expressible (fixed-width hex substring
# orders identically to the 60-bit numeric hash), sigma needs all-pairs
# path counts (the t side ranges over every node) — ~270k D rows at
# sf0.01, fine for DuckDB — and the estimate is the Brandes pair formula
# restricted to sampled s, scaled n/k. Validated cell-identical to the
# Spark output at sf0.001 and sf0.01 before registration.
_BETW_SAMPLED_LEVELS = 24  # >= full strong-graph diameter (measured 19 at sf0.01)


def _betweenness_sampled_oracle(levels: int, num_sources: int, seed: int) -> str:
    ctes = [
        """pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6)""",
        f"""edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM pos a JOIN pos b USING (isbn)
    WHERE a.user_id <> b.user_id
    GROUP BY a.user_id, b.user_id)
  WHERE w >= {COMPONENTS_MIN_WEIGHT})""",
        "nn AS (SELECT COUNT(DISTINCT src) AS n FROM edges)",
        f"""srcs AS MATERIALIZED (
  SELECT src AS s FROM (SELECT DISTINCT src FROM edges)
  ORDER BY substring(md5(CAST(src AS VARCHAR) || '#{seed}'), 1, 15), src
  LIMIT {num_sources})""",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS s, src AS v, 0 AS d, 1.0 AS sigma FROM edges)",
        "vis0 AS MATERIALIZED (SELECT * FROM l0)",
    ]
    for r in range(1, levels + 1):
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT p.s, e.dst AS v, {r} AS d, SUM(p.sigma) AS sigma
  FROM l{r - 1} p JOIN edges e ON e.src = p.v
  LEFT JOIN vis{r - 1} x ON x.s = p.s AND x.v = e.dst
  WHERE x.v IS NULL
  GROUP BY p.s, e.dst)"""
        )
        ctes.append(
            f"vis{r} AS MATERIALIZED (SELECT * FROM vis{r - 1} UNION ALL SELECT * FROM l{r})"
        )
    body = ",\n".join(ctes)
    # convergence assertion (ADVICE r4): the unroll depth is a constant
    # measured at driver scale — if a bigger graph's BFS is still
    # expanding at the last level, fail LOUDLY instead of silently
    # truncating sigma counts into a spurious engine-blamed mismatch
    return _q(
        f""", {body},
conv AS (SELECT CASE WHEN (SELECT COUNT(*) FROM l{levels}) > 0
                     THEN error('betweenness oracle: BFS unroll truncated at {levels} levels')
                     ELSE 1 END AS ok),
D AS MATERIALIZED (SELECT * FROM vis{levels}),
DS AS MATERIALIZED (SELECT * FROM D WHERE s IN (SELECT s FROM srcs))
SELECT sv.v AS user_id,
       ROUND(SUM(sv.sigma * vt.sigma / st.sigma)
             * (SELECT n FROM nn) / LEAST({num_sources}.0, (SELECT n FROM nn)), 6) AS betweenness
FROM DS sv
JOIN D vt ON vt.s = sv.v
JOIN DS st ON st.s = sv.s AND st.v = vt.v
WHERE sv.s <> sv.v AND vt.s <> vt.v AND sv.s <> vt.v
  AND sv.d + vt.d = st.d
  AND (SELECT ok FROM conv) = 1
GROUP BY sv.v"""
    )


register(
    "q_graph_betweenness",
    _betweenness_q,
    _betweenness_sampled_oracle(_BETW_SAMPLED_LEVELS, 16, 7),
)


# BM25 retrieval scoring against a fixed term set (Lucene's non-negative
# idf variant); constants interpolated from the same Python floats on
# both sides so the arithmetic is bit-identical before rounding
_BM25_TERMS = ["hash", "join", "window"]
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle(terms: list[str], k1: float, b: float) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return _q_docs(
        f"""
        , tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
        dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
        st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
               WHERE token IN ({tlist}) GROUP BY 1, 2),
        dft AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
        SELECT doc_id, n_hits, score FROM (
          SELECT tf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
                 ROUND(SUM(
                   ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                   * (tf.tf * ({k1!r} + 1.0))
                   / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl.dl / st.avgdl))
                 ), 6) AS score
          FROM tf JOIN dft USING (token) JOIN dl USING (doc_id) CROSS JOIN st
          GROUP BY tf.doc_id)
        ORDER BY score DESC, doc_id LIMIT 100
        """
    )


register(
    "q_text_bm25",
    lambda s, d: textstats.bm25_scores(
        _docs(s, d), terms=_BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_n=100
    ),
    _bm25_oracle(_BM25_TERMS, _BM25_K1, _BM25_B),
)


# sliding-window document chunking (RAG ingestion): 64-token windows
# every 48 tokens (16-token overlap)
_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48

register(
    "q_text_chunks",
    lambda s, d: textstats.chunk_documents(
        _docs(s, d), size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    ),
    _q_docs(
        f"""
        , tc AS (SELECT doc_id, t, len(t) AS n FROM toks),
        nc AS (SELECT doc_id, t,
                      CASE WHEN n <= {_CHUNK_SIZE} THEN 1
                           ELSE 1 + CAST(ceiling((n - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0) AS INT)
                      END AS n_chunks
               FROM tc),
        ch AS (SELECT doc_id, CAST(g.i - 1 AS INT) AS chunk_id, t
               FROM nc, LATERAL unnest(generate_series(1, n_chunks)) AS g(i))
        SELECT doc_id, chunk_id,
               chunk_id * {_CHUNK_STRIDE} AS start_pos,
               CAST(len(list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                                   chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE})) AS BIGINT) AS n_tokens,
               array_to_string(list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                                          chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ') AS chunk_text
        FROM ch
        """
    ),
)


def _pca_q(s: SparkSession, d: str) -> DataFrame:
    """Top-16 PCA projection of the embedding table in posexploded scalar
    shape — (vec_id, dim, value) — because the driver's pandas
    canonicalization can't sort array columns (rows-only: float-sum
    partials make exact values partition-order dependent; parity with
    numpy PCA and all spectral invariants pinned in
    tests/test_pipeline_ops.py::test_pca_matches_numpy_and_invariants;
    q_emb_pca_moments is the driver-attestable twin: the full mean/cov
    information content value-hash checked against SQL moments)."""
    from .operators.pca import pca_project

    return pca_project(_ref(s, d).embeddings, k=16).select(
        "vec_id", F.posexplode("proj").alias("dim", "value")
    ).select("vec_id", "dim", F.round("value", 6).alias("value"))


register("q_emb_pca", _pca_q, None)


# gap-filled regular resampling with forward fill (the hypertable
# time_bucket_gapfill + locf analog)
register(
    "q_events_gapfill",
    lambda s, d: events.resample_forward_fill(_ref(s, d).events, minutes=60),
    """
    WITH obs AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(ts) % 3600000000) AS bucket_us,
             ROUND(AVG(value), 6) AS obs
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM obs),
    grid AS (
      SELECT t.event_type, g.b AS bucket_us
      FROM (SELECT DISTINCT event_type FROM obs) t, bounds,
           LATERAL unnest(generate_series(bounds.lo, bounds.hi, 3600000000)) AS g(b))
    SELECT g.event_type, g.bucket_us,
           last_value(o.obs IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket_us
             ROWS UNBOUNDED PRECEDING) AS value,
           o.obs IS NULL AS is_gap
    FROM grid g LEFT JOIN obs o USING (event_type, bucket_us)
    """,
)


# item-item Jaccard similarity (Sarwar et al. item-based CF — the
# transpose of q_node_similarity)
register(
    "q_item_similarity",
    lambda s, d: corating.item_similarity_jaccard(
        _ref(s, d).ratings, cutoff=0.1, top_k=10
    ),
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        ideg AS (SELECT isbn, COUNT(*) AS dg FROM pos GROUP BY isbn),
        inter AS (
          SELECT a.isbn AS i1, b.isbn AS i2, COUNT(*) AS w
          FROM pos a JOIN pos b USING (user_id)
          WHERE a.isbn <> b.isbn
          GROUP BY 1, 2),
        sim AS (
          SELECT i1, i2,
                 ROUND(CAST(w AS DOUBLE) / (d1.dg + d2.dg - w), 6) AS similarity
          FROM inter
          JOIN ideg d1 ON d1.isbn = inter.i1
          JOIN ideg d2 ON d2.isbn = inter.i2)
        SELECT i1, i2, similarity FROM (
          SELECT i1, i2, similarity,
                 ROW_NUMBER() OVER (PARTITION BY i1 ORDER BY similarity DESC, i2) AS rn
          FROM sim WHERE similarity >= 0.1)
        WHERE rn <= 10
        """
    ),
)


# one-row corpus profile (the daily inspection query)
register(
    "q_corpus_profile",
    lambda s, d: textstats.corpus_profile(_docs(s, d)),
    _q_docs(
        """
        , fp AS (
          SELECT doc_id, lang, source, n_chars,
                 len(string_split(n2.norm, ' ')) AS n_tokens,
                 md5(array_to_string(list_sort(list_distinct(string_split(n2.norm, ' '))), ' ')) AS f
          FROM documents d JOIN norm n2 USING (doc_id)),
        hist AS (SELECT n_chars, COUNT(*) AS c FROM fp GROUP BY n_chars),
        med AS (
          SELECT MIN(n_chars) AS p50_chars FROM (
            SELECT n_chars,
                   SUM(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(c) OVER () AS n
            FROM hist)
          WHERE cum >= CEILING(n / 2.0)),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(COUNT(DISTINCT f) AS BIGINT) AS distinct_fingerprints,
                 CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                 CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                 ROUND(AVG(n_tokens), 6) AS mean_tokens
          FROM fp)
        SELECT n_docs, total_tokens, distinct_fingerprints,
               ROUND(1.0 - CAST(distinct_fingerprints AS DOUBLE) / n_docs, 6) AS dup_fraction,
               n_langs, n_sources, mean_tokens, p50_chars
        FROM st CROSS JOIN med
        """
    ),
)


def _opq_q(s: SparkSession, d: str) -> DataFrame:
    """OPQ-ADC top-k (rows-only like the other approximate ANN variants;
    rotation orthonormality, dot-product preservation, and the 5x
    distortion win over plain PQ on unbalanced-energy data are pinned in
    tests/test_pipeline_ops.py::test_opq_rotation_invariants_and_recall;
    q_simsearch_opq_exact is the driver-attestable twin)."""
    from .operators.pq import topk_opq

    emb = _ref(s, d).embeddings
    return topk_opq(
        emb.filter(F.col("vec_id") < 10), emb, k=10, m=8, rerank=4
    )


register("q_simsearch_opq", _opq_q, None)


# full CUBE grouping sets over events: completes the OLAP grouping surface
# next to q_events_rollup (which only descends the (day, type) hierarchy);
# GROUPING() flags distinguish rolled-up NULLs from NULL data values.
# rolling mean over the gap-filled grid: the oracle REUSES the gapfill
# twin verbatim as a subquery and wraps the same ROWS window around it, so
# the two queries cannot drift apart


def _ma_q(s: SparkSession, d: str) -> DataFrame:
    return events.moving_average(_ref(s, d).events, minutes=60, window=3)


register(
    "q_events_moving_avg",
    _ma_q,
    f"""
    WITH base AS ({{GAPFILL}})
    SELECT event_type, bucket_us, value,
           ROUND(AVG(value) OVER (PARTITION BY event_type ORDER BY bucket_us
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg
    FROM base
    """.replace("{GAPFILL}", QUERIES["q_events_gapfill"][1]),
)

register(
    "q_events_trend",
    lambda s, d: events.value_trend(_ref(s, d).events),
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, epoch_us(ts) / 86400000000.0), 6) AS slope,
           ROUND(regr_intercept(value, epoch_us(ts) / 86400000000.0), 6) AS intercept,
           ROUND(regr_r2(value, epoch_us(ts) / 86400000000.0), 6) AS r2
    FROM events GROUP BY event_type
    """,
)

register(
    "q_events_cube",
    lambda s, d: events.cube_counts(_ref(s, d).events),
    """
    SELECT day_us, event_type,
           CAST(GROUPING(day_us) AS INT) AS g_day,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
    FROM (SELECT (epoch_us(ts) - epoch_us(ts) % 86400000000) AS day_us,
                 event_type, value
          FROM events)
    GROUP BY CUBE (day_us, event_type)
    """,
)


# corpus-level collocation mining: top adjacent-pair PMI (Church & Hanks
# 1990). Bigrams in the oracle ride DuckDB's positional multi-unnest of the
# two shifted token slices; PMI arithmetic is written with the exact
# left-to-right op order of the Spark expression so doubles agree pre-round.
register(
    "q_text_collocations",
    lambda s, d: textstats.collocations_pmi(_docs(s, d), min_count=5, top_k=50),
    _q_docs(
        """
        , bg AS (
          SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
          FROM toks WHERE len(t) >= 2),
        pc AS (SELECT w1, w2, COUNT(*) AS pair_count FROM bg GROUP BY w1, w2),
        tp AS (SELECT SUM(pair_count) AS n_pair FROM pc),
        tk AS (SELECT unnest(t) AS token FROM toks),
        uc AS (SELECT token, COUNT(*) AS c_tok FROM tk GROUP BY token),
        tt AS (SELECT SUM(c_tok) AS n_tok FROM uc)
        SELECT w1, w2, pair_count,
               ROUND(LN((pair_count * CAST(n_tok AS DOUBLE) * n_tok)
                        / (CAST(n_pair AS DOUBLE) * u1.c_tok * u2.c_tok)), 6) AS pmi
        FROM pc
        JOIN uc u1 ON pc.w1 = u1.token
        JOIN uc u2 ON pc.w2 = u2.token
        CROSS JOIN tt CROSS JOIN tp
        WHERE pair_count >= 5
        ORDER BY pmi DESC, w1, w2 LIMIT 50
        """
    ),
)


# hard-negative mining for contrastive training: per query, top-k corpus
# vectors inside the similarity annulus [lo, hi) — the band test runs on
# the shared 6dp-rounded cosine so engines agree on boundary pairs.
_HN_LO, _HN_HI = 0.05, 0.35
register(
    "q_emb_hard_negatives",
    lambda s, d: simsearch.hard_negatives(
        _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
        _ref(s, d).embeddings,
        lo=_HN_LO,
        hi=_HN_HI,
        k=10,
    ),
    _q_vec(
        f"""
        , pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, similarity FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY similarity DESC, neighbor_id) AS rn
          FROM pairs
          WHERE similarity >= {_HN_LO} AND similarity < {_HN_HI}) WHERE rn <= 10
        """
    ),
)


# deterministic hash-seeded random walks (DeepWalk/node2vec corpus step):
# the per-step choice is argmin over md5_60bit(walk|step|neighbor, seed),
# so the full walk corpus is hash-comparable against this unrolled twin.
_WALK_STEPS = 3
_WALK_SEED = 7
_WALK_MOD = 20


def _walks_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.graphs import random_walks

    return random_walks(
        _ref(s, d).ratings, steps=_WALK_STEPS, start_mod=_WALK_MOD, seed=_WALK_SEED
    )


def _walks_step_cte(i: int, prev: str) -> str:
    h = (
        f"CAST(('0x' || substr(md5(w.walk_id || '|{i}|' || e.dst || '#{_WALK_SEED}'), 1, 15)) AS BIGINT)"
    )
    return f"""s{i} AS (SELECT walk_id, node FROM (
  SELECT w.walk_id, e.dst AS node,
         ROW_NUMBER() OVER (PARTITION BY w.walk_id ORDER BY {h}, e.dst) AS rn
  FROM {prev} w JOIN e ON w.node = e.src) WHERE rn = 1)"""


_WALKS_ORACLE = (
    f"""{ORACLE_PRELUDE},
e AS (
  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 'b:' || isbn AS dst FROM ratings
  UNION ALL
  SELECT 'b:' || isbn AS src, 'u:' || CAST(user_id AS VARCHAR) AS dst FROM ratings
),
w0 AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS walk_id,
                  'u:' || CAST(user_id AS VARCHAR) AS node
  FROM ratings WHERE user_id % {_WALK_MOD} = 0
),
"""
    + ",\n".join(
        _walks_step_cte(i, "w0" if i == 1 else f"s{i - 1}")
        for i in range(1, _WALK_STEPS + 1)
    )
    + "\nSELECT walk_id, 0 AS step, node FROM w0"
    + "".join(
        f"\nUNION ALL SELECT walk_id, {i} AS step, node FROM s{i}"
        for i in range(1, _WALK_STEPS + 1)
    )
)

register("q_graph_walks", _walks_q, _WALKS_ORACLE)

_WALK_P, _WALK_Q = 4.0, 2.0


def _biased_walks_q(s: SparkSession, d: str) -> DataFrame:
    """node2vec-style biased walks (p=4, q=2): second-order walk corpus
    for embedding training, derandomized by the deterministic md5 A-ES
    key so the full corpus value-hashes against the unrolled SQL twin."""
    from .plans.graphs import biased_walks

    return biased_walks(
        _ref(s, d).ratings, steps=_WALK_STEPS, start_mod=_WALK_MOD,
        seed=_WALK_SEED, p=_WALK_P, q=_WALK_Q,
    )


def _biased_step_cte(i: int, prev: str) -> str:
    h = (
        f"CAST(('0x' || substr(md5(w.walk_id || '|{i}|' || e.dst || "
        f"'#{_WALK_SEED}'), 1, 15)) AS BIGINT)"
    )
    key = (
        f"(-ln(({h} + 1.0) / 1152921504606846976.0)) / "
        f"(CASE WHEN w.prev IS NULL THEN 1.0 "
        f"WHEN e.dst = w.prev THEN {1.0 / _WALK_P!r} "
        f"WHEN a.pd IS NOT NULL THEN 1.0 "
        f"ELSE {1.0 / _WALK_Q!r} END)"
    )
    return f"""b{i} AS (SELECT walk_id, nprev AS prev, dst AS node FROM (
  SELECT w.walk_id, w.node AS nprev, e.dst,
         ROW_NUMBER() OVER (PARTITION BY w.walk_id ORDER BY {key}, e.dst) AS rn
  FROM {prev} w JOIN e ON w.node = e.src
  LEFT JOIN adj a ON a.ps = w.prev AND a.pd = e.dst) WHERE rn = 1)"""


_BIASED_WALKS_ORACLE = (
    f"""{ORACLE_PRELUDE},
e AS (
  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 'b:' || isbn AS dst FROM ratings
  UNION ALL
  SELECT 'b:' || isbn AS src, 'u:' || CAST(user_id AS VARCHAR) AS dst FROM ratings
),
adj AS (SELECT DISTINCT src AS ps, dst AS pd FROM e),
b0 AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS walk_id,
                  CAST(NULL AS VARCHAR) AS prev,
                  'u:' || CAST(user_id AS VARCHAR) AS node
  FROM ratings WHERE user_id % {_WALK_MOD} = 0
),
"""
    + ",\n".join(
        _biased_step_cte(i, "b0" if i == 1 else f"b{i - 1}")
        for i in range(1, _WALK_STEPS + 1)
    )
    + "\nSELECT walk_id, 0 AS step, node FROM b0"
    + "".join(
        f"\nUNION ALL SELECT walk_id, {i} AS step, node FROM b{i}"
        for i in range(1, _WALK_STEPS + 1)
    )
)

register("q_graph_walks_biased", _biased_walks_q, _BIASED_WALKS_ORACLE)



# BPE training is EAGER — bpe_merges runs its full driver-side merge loop
# the moment the registry lambda is invoked (ADVICE r3) — so results are
# memoized per (context, sf_dir, num_merges): schema-only sweeps and
# repeated invocations pay the training cost once per session.
_BPE_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _bpe_cached(s: SparkSession, d: str, num_merges: int) -> DataFrame:
    from .operators.bpe import bpe_merges

    key = (s.sparkContext.applicationId, d, num_merges)
    res = _BPE_CACHE.get(key)
    if res is None:
        res = bpe_merges(_docs(s, d), num_merges=num_merges)
        _BPE_CACHE[key] = res
    return res


def _bpe_q(s: SparkSession, d: str) -> DataFrame:
    """BPE merge training (rows-only: the data-dependent merge recursion is
    not SQL-expressible — the driver records the rows-only check and the
    exact merge table is cross-checked against a pure-Python reference BPE
    in tests/test_pipeline_ops.py::test_bpe_merges_match_reference;
    q_corpus_bpe_merges is the driver-attestable twin: the first 4 merge
    rounds vs a windowed SQL re-implementation). EAGER on first call,
    memoized after (the result is a tiny driver-built table)."""
    return _bpe_cached(s, d, 8)


register("q_corpus_bpe", _bpe_q, None)



# --- driver-attestable twins for the rows-only surfaces (VERDICT r3 #1) ----
#
# CORRECTNESS hash rows are the only hard evidence channel, and the 23
# rows-only queries above had none. Each query below re-expresses one of
# those surfaces as a deterministic, SQL-recomputable invariant:
#
# - the approximate-ANN paths run in a configuration where the approximate
#   result PROVABLY equals exact brute force (full probe / full rerank), so
#   the candidate generation, ADC/encode plumbing, rerank contract and
#   tie-breaks all get a full value-hash check (approximation quality at
#   production settings stays pytest-pinned: recall tests);
# - the float-iterative algorithms (k-means, PCA, Louvain, pipeline) get
#   either their distributed kernel checked at a deterministic fixpoint
#   (0-iteration assignment, moment matrices) or an invariant row whose
#   every field the oracle recomputes from first principles;
# - the sketch operators emit exact-vs-sketch bound checks whose TRUE-ness
#   the Spark side has to earn;
# - the multimodal mapInPandas kernels emit md5 digests of their binary
#   outputs, recomputed in SQL from the deterministic payload construction;
# - betweenness and BPE get bounded exact twins (unrolled Brandes levels /
#   merge rounds in SQL).


def _ivf_exact_q(s: SparkSession, d: str) -> DataFrame:
    """IVF at full probe (nprobe == num_cells): every cell is probed, so
    the candidate set is the whole catalog and the result must equal exact
    brute-force top-k — a value-hash check of the train/assign/probe/rerank
    machinery (q_simsearch_ivf keeps the production nprobe=4 setting)."""
    from .operators.ivf import topk_ivf

    emb = _ref(s, d).embeddings
    return topk_ivf(
        emb.filter(F.col("vec_id") < 10), emb, k=10, num_cells=8, nprobe=8,
        lloyd_iters=1,
    )


_BRUTE_TOPK_ORACLE = _q_vec(
    f"""
    , pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
      FROM vec a, vec b, range(1, 65) t(i)
      WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, similarity FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY similarity DESC, neighbor_id) AS rn
      FROM pairs) WHERE rn <= 10
    """
)

register("q_simsearch_ivf_exact", _ivf_exact_q, _BRUTE_TOPK_ORACLE)


def _simsearch_ivfpq(s: SparkSession, d: str) -> DataFrame:
    """IVF-PQ (IVFADC): coarse cells + residual PQ codes — candidates AND
    bytes bounded, the faiss-production composition. Rows-only (Lloyd
    means float-order dependent); q_simsearch_ivfpq_exact is the twin."""
    from .operators.ivfpq import topk_ivfpq

    emb = _ref(s, d).embeddings
    return topk_ivfpq(
        emb.filter(F.col("vec_id") < 10), emb, k=10, nprobe=4, m=8, rerank=4
    )


register("q_simsearch_ivfpq", _simsearch_ivfpq, None)


def _ivfpq_exact_q(s: SparkSession, d: str) -> DataFrame:
    """IVF-PQ at full probe AND full re-rank: every cell probed, every
    ADC candidate exactly re-scored — the composition must equal
    brute-force top-k, value-hashing the centroid training, residual
    computation, code assignment, probe accounting, and the ⟨q,c⟩+ADC
    decomposition in one check."""
    from .operators.ivfpq import topk_ivfpq

    emb = _ref(s, d).embeddings
    return topk_ivfpq(
        emb.filter(F.col("vec_id") < 10),
        emb,
        k=10,
        num_cells=8,
        nprobe=8,
        m=8,
        rerank=1_000_000,
        lloyd_iters=1,
    )


register("q_simsearch_ivfpq_exact", _ivfpq_exact_q, _BRUTE_TOPK_ORACLE)


def _pq_exact_q(s: SparkSession, d: str) -> DataFrame:
    """PQ-ADC with rerank large enough that every catalog vector survives
    the ADC pass: the exact rerank then sees all candidates and the output
    must equal brute-force top-k regardless of codebook quality — hash-
    checks encode, the ADC LUT join, and the rerank contract end to end."""
    from .operators.pq import topk_pq

    emb = _ref(s, d).embeddings
    return topk_pq(
        emb.filter(F.col("vec_id") < 10), emb, k=10, m=16, rerank=1_000_000
    )


register("q_simsearch_pq_exact", _pq_exact_q, _BRUTE_TOPK_ORACLE)


def _opq_exact_q(s: SparkSession, d: str) -> DataFrame:
    """OPQ at full rerank: the rotation is orthonormal, so rerank cosines
    in rotated space equal raw-space cosines (to float round-off, ~1e-14,
    far inside the 6dp rounding) and the result must equal brute force —
    hash-checks the rotation + eigenvalue-allocation + PQ pipeline."""
    from .operators.pq import topk_opq

    emb = _ref(s, d).embeddings
    return topk_opq(
        emb.filter(F.col("vec_id") < 10), emb, k=10, m=8, rerank=1_000_000
    )


register("q_simsearch_opq_exact", _opq_exact_q, _BRUTE_TOPK_ORACLE)


def _cluster_assign_q(s: SparkSession, d: str) -> DataFrame:
    """k-means at the deterministic fixpoint (0 Lloyd iterations): the
    centroids are exactly the 8 smallest md5-ranked vectors, so the
    assignment argmax — the inner loop every Lloyd round reuses — is a
    pure function of the data that SQL recomputes verbatim. Lloyd mean
    updates stay float-order dependent and pytest-pinned
    (q_corpus_cluster keeps the production 4-iteration setting)."""
    from .operators.ivf import cluster_corpus

    return cluster_corpus(_ref(s, d).embeddings, k=8, lloyd_iters=0)


register(
    "q_corpus_cluster_assign",
    _cluster_assign_q,
    _q_vec(
        f"""
        , ranked AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
          FROM vec),
        seeds AS (
          SELECT r.cell, v.v AS sv FROM ranked r JOIN vec v USING (vec_id)
          WHERE r.cell < 8),
        sims AS (
          SELECT a.vec_id, s.cell,
                 SUM(a.v[t.i] * s.sv[t.i])
                 / (SQRT(SUM(a.v[t.i] * a.v[t.i])) * SQRT(SUM(s.sv[t.i] * s.sv[t.i]))) AS sim
          FROM vec a, seeds s, range(1, 65) t(i)
          GROUP BY a.vec_id, s.cell)
        SELECT vec_id, cluster, similarity FROM (
          SELECT vec_id, cell AS cluster, ROUND(sim, 6) AS similarity,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
          FROM sims) WHERE rn = 1
        """
    ),
)


def _semantic_dedup_q(s: SparkSession, d: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) at production settings: k-means cells
    (4 Lloyd iterations — float-order dependent, hence rows-only) +
    member-vs-representative cosine drop. Attestable twin:
    q_corpus_semantic_dedup_exact pins the full decision table at the
    deterministic 0-iteration fixpoint."""
    return dedup.semantic_dedup(
        _ref(s, d).embeddings, k=16, lloyd_iters=4, threshold=0.35
    )


register("q_corpus_semantic_dedup", _semantic_dedup_q, None)


def _semantic_dedup_exact_q(s: SparkSession, d: str) -> DataFrame:
    """SemDeDup at the deterministic k-means fixpoint (0 Lloyd
    iterations, the q_corpus_cluster_assign pattern): centroids are the
    8 smallest md5-ranked vectors, so cell assignment, representative
    selection (closest-to-centroid, tie smallest id), and the
    member-vs-representative cosine drop are all pure functions of the
    parquet doubles that SQL recomputes verbatim — a full value-hash of
    every (vec_id, cluster, rep_id, rep_sim, keep) row."""
    return dedup.semantic_dedup(
        _ref(s, d).embeddings, k=8, lloyd_iters=0, threshold=0.35
    )


register(
    "q_corpus_semantic_dedup_exact",
    _semantic_dedup_exact_q,
    _q_vec(
        """
        , ranked AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
          FROM vec),
        seeds AS (
          SELECT r.cell, v.v AS sv FROM ranked r JOIN vec v USING (vec_id)
          WHERE r.cell < 8),
        sims AS (
          SELECT a.vec_id, s.cell,
                 SUM(a.v[t.i] * s.sv[t.i])
                 / (SQRT(SUM(a.v[t.i] * a.v[t.i])) * SQRT(SUM(s.sv[t.i] * s.sv[t.i]))) AS sim
          FROM vec a, seeds s, range(1, 65) t(i)
          GROUP BY a.vec_id, s.cell),
        assign AS (
          SELECT vec_id, cell AS cluster, similarity FROM (
            SELECT vec_id, cell, ROUND(sim, 6) AS similarity,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
            FROM sims) WHERE rn = 1),
        reps AS (
          SELECT cluster, vec_id AS rep_id FROM (
            SELECT cluster, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY cluster
                                      ORDER BY similarity DESC, vec_id) AS rn
            FROM assign) WHERE rn = 1)
        SELECT m.vec_id, m.cluster, r.rep_id,
               ROUND(SUM(a.v[t.i] * b.v[t.i])
                     / (SQRT(SUM(a.v[t.i] * a.v[t.i])) * SQRT(SUM(b.v[t.i] * b.v[t.i]))), 6) AS rep_sim,
               (m.vec_id = r.rep_id
                OR ROUND(SUM(a.v[t.i] * b.v[t.i])
                         / (SQRT(SUM(a.v[t.i] * a.v[t.i])) * SQRT(SUM(b.v[t.i] * b.v[t.i]))), 6) < 0.35) AS keep
        FROM assign m
        JOIN reps r USING (cluster)
        JOIN vec a ON a.vec_id = m.vec_id
        JOIN vec b ON b.vec_id = r.rep_id, range(1, 65) t(i)
        GROUP BY m.vec_id, m.cluster, r.rep_id
        """
    ),
)


def _quantize_q(s: SparkSession, d: str) -> DataFrame:
    """Int8 storage quantization of the embedding table (4x smaller than
    float32; search-side compression is PQ's job). Fully oracle-checked:
    the codes and scales are pure per-row arithmetic both engines compute
    from the same parquet doubles."""
    from .operators.quantize import quantize_int8_flat

    return quantize_int8_flat(_ref(s, d).embeddings)


register(
    "q_emb_quantize",
    _quantize_q,
    _q_vec(
        """
        , m AS (
          SELECT vec_id, v, (SELECT MAX(ABS(x)) FROM unnest(v) t(x)) AS ma
          FROM vec)
        SELECT vec_id, CAST(t.i - 1 AS INT) AS dim,
               CAST(CASE WHEN ma > 0 THEN ROUND(127.0 * v[t.i] / ma, 0) ELSE 0 END AS INT) AS q,
               ROUND(ma / 127.0, 9) AS scale
        FROM m, range(1, 65) t(i)
        """
    ),
)


def _quantize_binary_q(s: SparkSession, d: str) -> DataFrame:
    """1-bit sign quantization packed into 32-bit words (BQ storage
    layout, 32x smaller than float32) — pure integer arithmetic both
    engines compute exactly."""
    from .operators.quantize import quantize_binary_flat

    return quantize_binary_flat(_ref(s, d).embeddings)


register(
    "q_emb_quantize_binary",
    _quantize_binary_q,
    _q_vec(
        """
        , e AS (
          SELECT vec_id, CAST(t.i - 1 AS INT) AS i0, v[t.i] AS x
          FROM vec, range(1, 65) t(i))
        SELECT vec_id, CAST(i0 // 32 AS INT) AS word_idx,
               CAST(SUM(CASE WHEN x > 0
                             THEN CAST(1 AS BIGINT) << CAST(i0 % 32 AS INT)
                             ELSE 0 END) AS BIGINT) AS word
        FROM e GROUP BY 1, 2
        """
    ),
)


def _simsearch_binary_q(s: SparkSession, d: str) -> DataFrame:
    """BQ + rescore ANN: Hamming candidates over the packed sign bits
    (popcount of XOR), exact-cosine re-rank — deterministic end to end
    (integer Hamming ties break on neighbor_id), so unlike IVF/PQ this
    approximate path needs no exact-mode twin: the production
    configuration itself is value-hash checked."""
    from .operators.quantize import topk_binary

    emb = _ref(s, d).embeddings
    return topk_binary(emb.filter(F.col("vec_id") < 10), emb, k=10, rerank=100)


register(
    "q_simsearch_binary",
    _simsearch_binary_q,
    _q_vec(
        """
        , e AS (
          SELECT vec_id, CAST(t.i - 1 AS INT) AS i0, v[t.i] AS x
          FROM vec, range(1, 65) t(i)),
        bits AS (
          SELECT vec_id, i0 // 32 AS w,
                 SUM(CASE WHEN x > 0
                          THEN CAST(1 AS BIGINT) << CAST(i0 % 32 AS INT)
                          ELSE 0 END) AS word
          FROM e GROUP BY 1, 2),
        ham AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 CAST(SUM(bit_count(xor(a.word, b.word))) AS INT) AS hamming
          FROM bits a JOIN bits b ON a.w = b.w
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        cand AS (
          SELECT query_id, neighbor_id, hamming FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY hamming, neighbor_id) AS rn
            FROM ham) WHERE rn <= 100),
        scored AS (
          SELECT c.query_id, c.neighbor_id, c.hamming,
                 ROUND(SUM(qa.v[t.i] * ca.v[t.i])
                       / (SQRT(SUM(qa.v[t.i] * qa.v[t.i]))
                          * SQRT(SUM(ca.v[t.i] * ca.v[t.i]))), 6) AS similarity
          FROM cand c
          JOIN vec qa ON qa.vec_id = c.query_id
          JOIN vec ca ON ca.vec_id = c.neighbor_id, range(1, 65) t(i)
          GROUP BY 1, 2, 3)
        SELECT query_id, neighbor_id, hamming, similarity FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY similarity DESC, neighbor_id) AS rn
          FROM scored) WHERE rn <= 10
        """
    ),
)


def _pca_moments_q(s: SparkSession, d: str) -> DataFrame:
    """The PCA stage's full information content, value-hash checkable:
    (i,-1) rows carry the mean vector, (i,j) rows the covariance matrix
    RECONSTRUCTED from the eigendecomposition (comps^T diag(evals) comps),
    and (-1,-1) the row count. The oracle recomputes mean/cov directly
    from the data, so a regression in the one-pass distributed moment
    kernel, the eigensolve, or the sign canonicalization all surface as a
    hash flip (q_emb_pca's projected values stay rows-only: float-sum
    partials are partition-order dependent at the last ulp)."""
    import numpy as np

    from .operators.pca import pca_fit

    emb = _ref(s, d).embeddings
    mean, comps, evals = pca_fit(emb, k=10**9)
    cov = comps.T @ (np.diag(evals) @ comps)
    n = emb.count()
    dims = len(mean)
    rows = [(-1, -1, float(n))]
    rows += [(i, -1, float(round(mean[i], 6))) for i in range(dims)]
    rows += [
        (i, j, float(round(cov[i, j], 6))) for i in range(dims) for j in range(dims)
    ]
    return s.createDataFrame(rows, "i int, j int, value double")


register(
    "q_emb_pca_moments",
    _pca_moments_q,
    _q_vec(
        """
        , x AS (SELECT vec_id, CAST(t.i - 1 AS INT) AS i, v[t.i] AS xi
                FROM vec, range(1, 65) t(i)),
        stats AS (SELECT i, AVG(xi) AS mu, COUNT(*) AS n FROM x GROUP BY i),
        covs AS (
          SELECT a.i AS i, b.i AS j,
                 (SUM(a.xi * b.xi) - COUNT(*) * sa.mu * sb.mu) / (COUNT(*) - 1) AS cov
          FROM x a JOIN x b USING (vec_id)
          JOIN stats sa ON sa.i = a.i JOIN stats sb ON sb.i = b.i
          GROUP BY a.i, b.i, sa.mu, sb.mu)
        SELECT CAST(-1 AS INT) AS i, CAST(-1 AS INT) AS j,
               CAST((SELECT COUNT(*) FROM vec) AS DOUBLE) AS value
        UNION ALL SELECT i, CAST(-1 AS INT), ROUND(mu, 6) FROM stats
        UNION ALL SELECT i, j, ROUND(cov, 6) FROM covs
        """
    ),
)


# exact Brandes twin (VERDICT r3 #1): betweenness on the even-user induced
# subgraph of the strong co-rating graph — deterministic, ~250 nodes at
# sf0.01, small enough that the all-pairs sigma table in the SQL twin stays
# tractable while the 54-node main component still makes the values
# nontrivial. num_sources >= n makes betweenness_approx EXACT Brandes
# (scale factor 1), so this is a full value-hash check of both BFS
# path-counting and the dependency accumulation; q_graph_betweenness keeps
# the production sampled estimate on the full strong graph.
_BETW_LEVELS = 20  # >= subgraph diameter at driver scales (measured 11 at sf0.01)


def _betweenness_exact_q(s: SparkSession, d: str) -> DataFrame:
    from .plans.betweenness import betweenness_approx

    sub = (
        _corating_double(s, d)
        .filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
        .filter((F.col("src") % 2 == 0) & (F.col("dst") % 2 == 0))
    )
    return betweenness_approx(sub, num_sources=1 << 30).select(
        F.col("node_id").alias("user_id"), "betweenness"
    )


def _betweenness_oracle(levels: int) -> str:
    ctes = [
        """pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6)""",
        f"""edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM pos a JOIN pos b USING (isbn)
    WHERE a.user_id <> b.user_id
    GROUP BY a.user_id, b.user_id)
  WHERE w >= {COMPONENTS_MIN_WEIGHT} AND src % 2 = 0 AND dst % 2 = 0)""",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS s, src AS v, 0 AS d, 1.0 AS sigma FROM edges)",
        "vis0 AS MATERIALIZED (SELECT * FROM l0)",
    ]
    for r in range(1, levels + 1):
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT p.s, e.dst AS v, {r} AS d, SUM(p.sigma) AS sigma
  FROM l{r - 1} p JOIN edges e ON e.src = p.v
  LEFT JOIN vis{r - 1} x ON x.s = p.s AND x.v = e.dst
  WHERE x.v IS NULL
  GROUP BY p.s, e.dst)"""
        )
        ctes.append(
            f"vis{r} AS MATERIALIZED (SELECT * FROM vis{r - 1} UNION ALL SELECT * FROM l{r})"
        )
    body = ",\n".join(ctes)
    # same loud-truncation guard as the sampled oracle (ADVICE r4)
    return _q(
        f""", {body},
conv AS (SELECT CASE WHEN (SELECT COUNT(*) FROM l{levels}) > 0
                     THEN error('exact-betweenness oracle: BFS unroll truncated at {levels} levels')
                     ELSE 1 END AS ok),
D AS MATERIALIZED (SELECT * FROM vis{levels})
SELECT sv.v AS user_id,
       ROUND(SUM(sv.sigma * vt.sigma / st.sigma), 6) AS betweenness
FROM D sv
JOIN D vt ON vt.s = sv.v
JOIN D st ON st.s = sv.s AND st.v = vt.v
WHERE sv.s <> sv.v AND vt.s <> vt.v AND sv.s <> vt.v
  AND sv.d + vt.d = st.d
  AND (SELECT ok FROM conv) = 1
GROUP BY sv.v"""
    )


register(
    "q_graph_betweenness_exact", _betweenness_exact_q, _betweenness_oracle(_BETW_LEVELS)
)


def _degree_q(s: SparkSession, d: str) -> DataFrame:
    """Degree centrality (gds.degree, UNDIRECTED) on the full co-rating
    projection — shares the projection cache with q_corating_projection."""
    from .plans.graphs import degree_centrality

    return degree_centrality(_corating_double(s, d)).select(
        F.col("node_id").alias("user_id"), "degree", "weighted_degree"
    )


register(
    "q_graph_degree",
    _degree_q,
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        edges AS (
          SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
          FROM pos a JOIN pos b USING (isbn)
          WHERE a.user_id <> b.user_id
          GROUP BY a.user_id, b.user_id)
        SELECT src AS user_id, CAST(COUNT(*) AS BIGINT) AS degree,
               CAST(SUM(w) AS DOUBLE) AS weighted_degree
        FROM edges GROUP BY src
        """
    ),
)


def _clustering_coef_q(s: SparkSession, d: str) -> DataFrame:
    """Local clustering coefficient (gds.localClusteringCoefficient) on
    the strong co-rating graph — reuses the hub-safe degree-ordered
    triangle counts (q_graph_triangles) plus one degree aggregate."""
    from .plans.graphs import clustering_coefficient

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return clustering_coefficient(strong).select(
        F.col("node_id").alias("user_id"), "degree", "triangles", "coefficient"
    )


register(
    "q_graph_clustering_coef",
    _clustering_coef_q,
    _q(
        f"""
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        und AS (
          SELECT src AS a, dst AS b FROM (
            SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
            FROM pos a JOIN pos b USING (isbn)
            WHERE a.user_id < b.user_id
            GROUP BY a.user_id, b.user_id)
          WHERE w >= {COMPONENTS_MIN_WEIGHT}),
        deg AS (
          SELECT node, COUNT(*) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          GROUP BY node),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        corners AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri),
        tcount AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node)
        SELECT deg.node AS user_id, CAST(deg.d AS BIGINT) AS degree,
               CAST(COALESCE(tcount.t, 0) AS BIGINT) AS triangles,
               CASE WHEN deg.d >= 2
                    THEN ROUND(2.0 * COALESCE(tcount.t, 0) / (deg.d * (deg.d - 1)), 6)
                    ELSE 0.0 END AS coefficient
        FROM deg LEFT JOIN tcount ON tcount.node = deg.node
        """
    ),
)


_SSSP_ROUNDS = 24  # >= max hops on optimal weighted paths (measured 15 at sf0.01)


def _sssp_q(s: SparkSession, d: str) -> DataFrame:
    """Weighted SSSP (gds.shortestPath.dijkstra analog) from the target
    user over the strong co-rating graph, cost = 1/weight."""
    from .plans.sssp import sssp_weighted

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return sssp_weighted(strong, UID).select(
        F.col("node_id").alias("user_id"), "dist"
    )


def _sssp_oracle(rounds: int) -> str:
    ctes = [
        """pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6)""",
        f"""edges AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM pos a JOIN pos b USING (isbn)
    WHERE a.user_id <> b.user_id
    GROUP BY a.user_id, b.user_id)
  WHERE w >= {COMPONENTS_MIN_WEIGHT})""",
        f"d0 AS (SELECT {UID} AS node, 0.0 AS dist)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{r - 1}
    UNION ALL
    SELECT e.dst AS node, p.dist + 1.0 / e.w AS dist
    FROM d{r - 1} p JOIN edges e ON e.src = p.node)
  GROUP BY node)"""
        )
    body = ",\n".join(ctes)
    # convergence assertion (ADVICE r4): Bellman-Ford must have reached
    # its fixpoint within the unrolled rounds (d{N} == d{N-1}; once no
    # relaxation fires the min re-derives bit-identical doubles, so EXCEPT
    # is an exact emptiness check) — otherwise fail loudly
    return _q(
        f""", {body},
conv AS (SELECT CASE WHEN (SELECT COUNT(*) FROM
                           (SELECT * FROM d{rounds} EXCEPT SELECT * FROM d{rounds - 1})) > 0
                     THEN error('sssp oracle: relaxation unroll truncated at {rounds} rounds')
                     ELSE 1 END AS ok)
SELECT node AS user_id, ROUND(dist, 6) AS dist FROM d{rounds}
WHERE (SELECT ok FROM conv) = 1"""
    )


register("q_graph_sssp", _sssp_q, _sssp_oracle(_SSSP_ROUNDS))


def _graph_summary_q(s: SparkSession, d: str) -> DataFrame:
    """One-row profile of the strong co-rating graph (gds.graph.list
    stats + global clustering + Newman degree assortativity)."""
    from .plans.graphs import graph_summary

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return graph_summary(strong)


register(
    "q_graph_summary",
    _graph_summary_q,
    _q(
        f"""
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        edges AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
            FROM pos a JOIN pos b USING (isbn)
            WHERE a.user_id <> b.user_id
            GROUP BY a.user_id, b.user_id)
          WHERE w >= {COMPONENTS_MIN_WEIGHT}),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
        und AS (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges GROUP BY 1, 2),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1 JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(SUM(d) / 2 AS BIGINT) AS n_edges,
                 CAST(MAX(d) AS BIGINT) AS max_degree,
                 ROUND(AVG(d), 6) AS avg_degree,
                 SUM(d * (d - 1) / 2.0) AS wedges
          FROM deg),
        t AS (SELECT 3.0 * COUNT(*) AS t3 FROM tri),
        asst AS (
          SELECT ROUND(corr(CAST(ds.d AS DOUBLE), CAST(dt.d AS DOUBLE)), 6) AS assortativity
          FROM edges e JOIN deg ds ON ds.node = e.src JOIN deg dt ON dt.node = e.dst)
        SELECT n_nodes, n_edges,
               ROUND(2.0 * n_edges / (n_nodes * (n_nodes - 1)), 6) AS density,
               avg_degree, max_degree,
               CASE WHEN wedges > 0 THEN ROUND(t3 / wedges, 6) ELSE 0.0 END AS transitivity,
               assortativity
        FROM s, t, asst
        """
    ),
)


def _closeness_q(s: SparkSession, d: str) -> DataFrame:
    """Sampled harmonic closeness (gds.closeness.harmonic) on the strong
    co-rating graph — same deterministic md5 source sample as the
    betweenness estimator, distances-only multi-source BFS."""
    from .plans.closeness import harmonic_closeness_approx

    strong = _corating_double(s, d).filter(F.col("weight") >= COMPONENTS_MIN_WEIGHT)
    return harmonic_closeness_approx(strong, num_sources=16, seed=7).select(
        F.col("node_id").alias("user_id"), "closeness"
    )


def _closeness_oracle(levels: int, num_sources: int, seed: int) -> str:
    ctes = [
        """pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6)""",
        f"""edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM pos a JOIN pos b USING (isbn)
    WHERE a.user_id <> b.user_id
    GROUP BY a.user_id, b.user_id)
  WHERE w >= {COMPONENTS_MIN_WEIGHT})""",
        "nn AS (SELECT COUNT(DISTINCT src) AS n FROM edges)",
        f"""l0 AS MATERIALIZED (
  SELECT src AS s, src AS v, 0 AS d FROM (SELECT DISTINCT src FROM edges)
  ORDER BY substring(md5(CAST(src AS VARCHAR) || '#{seed}'), 1, 15), src
  LIMIT {num_sources})""",
        "vis0 AS MATERIALIZED (SELECT * FROM l0)",
    ]
    for r in range(1, levels + 1):
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT DISTINCT p.s, e.dst AS v, {r} AS d
  FROM l{r - 1} p JOIN edges e ON e.src = p.v
  LEFT JOIN vis{r - 1} x ON x.s = p.s AND x.v = e.dst
  WHERE x.v IS NULL)"""
        )
        ctes.append(
            f"vis{r} AS MATERIALIZED (SELECT * FROM vis{r - 1} UNION ALL SELECT * FROM l{r})"
        )
    body = ",\n".join(ctes)
    # same loud-truncation guard as the betweenness oracles (ADVICE r4)
    return _q(
        f""", {body},
conv AS (SELECT CASE WHEN (SELECT COUNT(*) FROM l{levels}) > 0
                     THEN error('closeness oracle: BFS unroll truncated at {levels} levels')
                     ELSE 1 END AS ok)
SELECT v AS user_id,
       ROUND(SUM(1.0 / d) * (SELECT n FROM nn) / LEAST({num_sources}.0, (SELECT n FROM nn)), 6) AS closeness
FROM vis{levels}
WHERE d > 0 AND (SELECT ok FROM conv) = 1
GROUP BY v"""
    )


register(
    "q_graph_closeness",
    _closeness_q,
    _closeness_oracle(_BETW_SAMPLED_LEVELS, 16, 7),
)




def _bpe_merges_q(s: SparkSession, d: str) -> DataFrame:
    """The first 4 BPE merge rounds, value-hash checked: pair counting,
    the argmax tie-break (count desc, pair asc) and the leftmost-first
    non-overlapping merge application are each re-expressed in the SQL
    twin (windowed gaps-and-islands selection over exploded symbol
    tables), so the training recursion's per-round semantics get a hard
    driver check. q_corpus_bpe keeps the production 8-round run, cross-
    checked against a pure-Python reference in pytest."""
    return _bpe_cached(s, d, 4)


def _bpe_oracle(rounds: int, segment: bool = False) -> str:
    """SQL twin of ``bpe_merges`` (and, with ``segment=True``, of
    ``bpe_segment``): each round counts adjacent symbol pairs (weighted by
    word count), takes the argmax, and rebuilds the symbol table by greedy
    leftmost non-overlapping substitution — selection = odd-ranked
    positions within each consecutive run of matches (the closed form of
    the left fold's merged-flag guard). Segment mode applies ALL rounds'
    merges and emits per-document symbol counts instead of the merge
    table."""
    ctes = [
        r"""words AS (SELECT word, COUNT(*) AS wc FROM (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
  FROM documents) WHERE word NOT LIKE '%▁%' GROUP BY word)""",
        """syms1 AS MATERIALIZED (
  SELECT word, CAST(g.i AS BIGINT) AS pos, substring(word, CAST(g.i AS INT), 1) AS sym
  FROM words, LATERAL unnest(generate_series(1, length(word))) AS g(i)
  UNION ALL SELECT word, length(word) + 1 AS pos, '▁' FROM words)""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""p{r} AS (
  SELECT a.sym AS l, b.sym AS r, SUM(w.wc) AS pc
  FROM syms{r} a JOIN syms{r} b ON a.word = b.word AND b.pos = a.pos + 1
  JOIN words w ON w.word = a.word
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"m{r} AS MATERIALIZED (SELECT l, r, pc FROM p{r} ORDER BY pc DESC, l, r LIMIT 1)"
        )
        if r < rounds or segment:
            ctes.append(
                f"""mk{r} AS (
  SELECT a.word, a.pos FROM syms{r} a
  JOIN syms{r} b ON a.word = b.word AND b.pos = a.pos + 1
  CROSS JOIN m{r}
  WHERE a.sym = m{r}.l AND b.sym = m{r}.r)"""
            )
            ctes.append(
                f"""sel{r} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos, ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY pos) AS rr
    FROM (SELECT word, pos, pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
          FROM mk{r}))
  WHERE rr % 2 = 1)"""
            )
            ctes.append(
                f"""syms{r + 1} AS MATERIALIZED (
  SELECT word, ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos, sym FROM (
    SELECT s.word, s.pos,
           CASE WHEN sel.pos IS NOT NULL THEN m{r}.l || m{r}.r ELSE s.sym END AS sym
    FROM syms{r} s
    CROSS JOIN m{r}
    LEFT JOIN sel{r} sel ON sel.word = s.word AND sel.pos = s.pos
    LEFT JOIN sel{r} drp ON drp.word = s.word AND drp.pos = s.pos - 1
    WHERE drp.pos IS NULL))"""
            )
    if segment:
        sel = f"""wd AS (SELECT doc_id, word FROM (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents) WHERE word NOT LIKE '%▁%'),
wn AS (SELECT word, COUNT(*) AS n_after FROM syms{rounds + 1} GROUP BY word)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(word) + 1) AS BIGINT) AS n_syms_before,
       CAST(SUM(n_after) AS BIGINT) AS n_syms_after
FROM wd JOIN wn USING (word) GROUP BY doc_id"""
        return "WITH " + ",\n".join(ctes) + ",\n" + sel
    sel = "\nUNION ALL ".join(
        f'SELECT CAST({r} AS INT) AS rank, l AS "left", r AS "right", '
        f"CAST(pc AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


register("q_corpus_bpe_merges", _bpe_merges_q, _bpe_oracle(4))


def _bpe_segment_q(s: SparkSession, d: str) -> DataFrame:
    """The apply half of BPE: tokenize the corpus under the 4 learned
    merges (train and apply share the same Catalyst merge fold, so this
    also cross-checks the trainer's merge application at corpus scale —
    per-document symbol counts value-hash vs the SQL twin's windowed
    re-segmentation)."""
    from .operators.bpe import bpe_segment

    merges = [(r["left"], r["right"]) for r in _bpe_cached(s, d, 4).collect()]
    return bpe_segment(_docs(s, d), merges)


register("q_corpus_bpe_segment", _bpe_segment_q, _bpe_oracle(4, segment=True))


def _approx_pct_bounds_q(s: SparkSession, d: str) -> DataFrame:
    """Sketch-percentile bound check the Spark side has to EARN: the
    percentile_approx value must land between exact quantiles ±0.05 rank
    slack (the sketch's rank error at accuracy=10000 is far tighter; the
    slack keeps the check deterministic at driver scales). The oracle
    recomputes the group counts and asserts TRUE — a wrong sketch flips
    within_bounds to false and the value hash with it."""
    ev = _ref(s, d).events
    approx = events.approx_value_percentiles(ev)
    br = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "percentile(value, array(0.45D, 0.55D, 0.85D, 0.95D, 0.94D, 1.0D))"
        ).alias("_b"),
    )
    lo = (
        F.when(F.col("quantile") == 0.5, F.col("_b")[0])
        .when(F.col("quantile") == 0.9, F.col("_b")[2])
        .otherwise(F.col("_b")[4])
    )
    hi = (
        F.when(F.col("quantile") == 0.5, F.col("_b")[1])
        .when(F.col("quantile") == 0.9, F.col("_b")[3])
        .otherwise(F.col("_b")[5])
    )
    return approx.join(br, "event_type").select(
        "event_type",
        "quantile",
        "n",
        ((F.col("value") >= lo - 1e-6) & (F.col("value") <= hi + 1e-6)).alias(
            "within_bounds"
        ),
    )


register(
    "q_events_approx_bounds",
    _approx_pct_bounds_q,
    """
    SELECT e.event_type, CAST(t.q AS DOUBLE) AS quantile,
           CAST(COUNT(*) AS BIGINT) AS n, TRUE AS within_bounds
    FROM events e CROSS JOIN (VALUES (0.5), (0.9), (0.99)) t(q)
    GROUP BY 1, 2
    """,
)


def _approx_users_bounds_q(s: SparkSession, d: str) -> DataFrame:
    """HLL++ distinct-count bound check (|approx - exact| <= 15% = 3x the
    configured rsd): the estimate is a deterministic function of the data
    (hash-based sketch, no RNG), so the boolean is stable; the exact
    per-group count rides along as a real SQL-recomputed value."""
    ev = _ref(s, d).events
    ap = events.approx_distinct_users(ev)
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return ex.join(ap, "event_type").select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("n_users_approx") - F.col("n_users"))
            <= 0.15 * F.col("n_users")
        ).alias("within_rsd_bound"),
    )


register(
    "q_events_approx_users_bounds",
    _approx_users_bounds_q,
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS within_rsd_bound
    FROM events GROUP BY 1
    """,
)


# multimodal digests: the asset payloads are deterministic constructions
# over the document text (operators/multimodal.py assets_from_documents:
# image = 11B P6 header + first 192 utf-8 bytes zero-padded, audio = 44B
# WAV header + first 256 bytes zero-padded, text = raw utf-8), and the
# driver documents are pure ASCII — so the SQL twin can rebuild every
# payload byte-for-byte as a hex string (rpad with '0' pairs = zero bytes)
# and recompute the decoders' outputs and the kernels' binary digests.
# Spark and DuckDB both emit uppercase hex and identical md5 hex strings.
_PPM_HDR_HEX = multimodal._PPM_HEADER.hex().upper()
_WAV_HDR_HEX = multimodal._WAV_HEADER.hex().upper()


def _mm_features_digest_q(s: SparkSession, d: str) -> DataFrame:
    """extract_features through the REAL stdlib decoders, value-hash
    checked: every decoded field (geometry, sample rate, byte sums) is
    recomputed by the oracle from the payload construction. mean_value is
    exported as the integer byte sum (mean * raster size) — the decoder's
    Python round() is banker's while SQL ROUND is half-up, and 25% of the
    /256 means sit exactly on a 6dp half boundary; the integer sum is
    rounding-mode-proof and carries the same information. crc32 stays
    pytest-only (no SQL twin)."""
    feats = multimodal.extract_features(multimodal.assets_from_documents(_docs(s, d)))
    n_for_kind = F.when(F.col("kind") == "image", F.lit(192)).when(
        F.col("kind") == "audio", F.lit(256)
    )
    return feats.select(
        "asset_id",
        "kind",
        "n_bytes",
        "first_byte",
        "last_byte",
        "decoded",
        "width",
        "height",
        "channels",
        "sample_rate",
        "n_samples",
        F.round(F.col("mean_value") * n_for_kind, 0).cast("long").alias("byte_sum"),
    )


register(
    "q_multimodal_features_digest",
    _mm_features_digest_q,
    """
    WITH sums AS (
      SELECT d.doc_id,
             SUM(CASE WHEN t.i <= 192 THEN unicode(substring(d.text, CAST(t.i AS INT), 1)) ELSE 0 END) AS s192,
             SUM(unicode(substring(d.text, CAST(t.i AS INT), 1))) AS s256
      FROM documents d,
           LATERAL unnest(generate_series(1, least(length(d.text), 256))) t(i)
      GROUP BY d.doc_id)
    SELECT d.doc_id AS asset_id,
           CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END AS kind,
           CAST(CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN length(d.text) WHEN 1 THEN 203 ELSE 300 END AS BIGINT) AS n_bytes,
           CAST(CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN unicode(substring(d.text, 1, 1)) WHEN 1 THEN 80 ELSE 82 END AS BIGINT) AS first_byte,
           CAST(CASE CAST(d.doc_id % 3 AS INT)
                WHEN 0 THEN unicode(substring(d.text, length(d.text), 1))
                WHEN 1 THEN CASE WHEN length(d.text) >= 192 THEN unicode(substring(d.text, 192, 1)) ELSE 0 END
                ELSE CASE WHEN length(d.text) >= 256 THEN unicode(substring(d.text, 256, 1)) ELSE 0 END END AS BIGINT) AS last_byte,
           (d.doc_id % 3 <> 0) AS decoded,
           CAST(CASE WHEN d.doc_id % 3 = 1 THEN 8 END AS BIGINT) AS width,
           CAST(CASE WHEN d.doc_id % 3 = 1 THEN 8 END AS BIGINT) AS height,
           CAST(CASE WHEN d.doc_id % 3 = 1 THEN 3 WHEN d.doc_id % 3 = 2 THEN 1 END AS BIGINT) AS channels,
           CAST(CASE WHEN d.doc_id % 3 = 2 THEN 8000 END AS BIGINT) AS sample_rate,
           CAST(CASE WHEN d.doc_id % 3 = 2 THEN 256 END AS BIGINT) AS n_samples,
           CAST(CASE WHEN d.doc_id % 3 = 1 THEN s.s192 WHEN d.doc_id % 3 = 2 THEN s.s256 END AS BIGINT) AS byte_sum
    FROM documents d JOIN sums s ON s.doc_id = d.doc_id
    """,
)


def _mm_resize_digest_q(s: SparkSession, d: str) -> DataFrame:
    """resize_images (16x16 -> 256-byte payload contract) with an md5
    digest of each output payload's hex form; the oracle rebuilds the
    truncate-and-zero-pad result from the PPM construction and hashes the
    same hex string."""
    rs = multimodal.resize_images(
        multimodal.assets_from_documents(_docs(s, d)), width=16, height=16
    )
    return rs.select(
        "asset_id",
        "kind",
        "width",
        "height",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"),
    )


register(
    "q_multimodal_resize_digest",
    _mm_resize_digest_q,
    f"""
    SELECT doc_id AS asset_id, 'image' AS kind,
           CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
           CAST(256 AS BIGINT) AS n_bytes,
           md5(rpad(substring('{_PPM_HDR_HEX}' || rpad(hex(substring(text, 1, 192)), 384, '0'), 1, 512), 512, '0')) AS payload_md5
    FROM documents WHERE doc_id % 3 = 1
    """,
)


def _mm_frames_digest_q(s: SparkSession, d: str) -> DataFrame:
    """sample_frames (256-byte strides over the temporal kinds) with md5
    digests: the 300-byte WAV payloads yield exactly two frames (256 and
    44 bytes), both rebuilt byte-for-byte by the oracle."""
    fr = multimodal.sample_frames(
        multimodal.assets_from_documents(_docs(s, d)), every_n_bytes=256, max_frames=4
    )
    return fr.select(
        "asset_id",
        "frame_idx",
        F.length("frame_bytes").cast("long").alias("n_bytes"),
        F.md5(F.hex("frame_bytes")).alias("frame_md5"),
    )


register(
    "q_multimodal_frames_digest",
    _mm_frames_digest_q,
    f"""
    WITH wav AS (
      SELECT doc_id, '{_WAV_HDR_HEX}' || rpad(hex(substring(text, 1, 256)), 512, '0') AS ph
      FROM documents WHERE doc_id % 3 = 2)
    SELECT doc_id AS asset_id, CAST(0 AS BIGINT) AS frame_idx,
           CAST(256 AS BIGINT) AS n_bytes, md5(substring(ph, 1, 512)) AS frame_md5
    FROM wav
    UNION ALL
    SELECT doc_id, CAST(1 AS BIGINT), CAST(44 AS BIGINT), md5(substring(ph, 513, 88))
    FROM wav
    """,
)

# Perceptual-hash dedup (round-5 VERDICT item 4): the dHash words per
# image asset, and the banded-Hamming near-dup pairs over them. The image
# assets are the 8×8 PPMs assets_from_documents builds from text bytes, so
# the ORACLE rebuilds the exact pixels char-by-char and re-derives the
# integer-exact area-resize + gradient bits in SQL — a full value-hash of
# the whole pixel→resize→gradient→banding pipeline, not just a digest.
_PHASH_WORDS_CTES = """
img AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 1),
px AS MATERIALIZED (
  -- gray3(y, x) = sum of the 3 raster bytes; raster = first 192 text
  -- bytes zero-padded (the PPM payload construction)
  SELECT asset_id, (p.i - 1) // 8 AS y, (p.i - 1) % 8 AS x,
         (CASE WHEN length(text) >= 3 * (p.i - 1) + 1
               THEN unicode(substring(text, CAST(3 * (p.i - 1) + 1 AS INT), 1)) ELSE 0 END
        + CASE WHEN length(text) >= 3 * (p.i - 1) + 2
               THEN unicode(substring(text, CAST(3 * (p.i - 1) + 2 AS INT), 1)) ELSE 0 END
        + CASE WHEN length(text) >= 3 * (p.i - 1) + 3
               THEN unicode(substring(text, CAST(3 * (p.i - 1) + 3 AS INT), 1)) ELSE 0 END) AS g3
  FROM img, LATERAL unnest(generate_series(1, 64)) p(i)),
cells AS MATERIALIZED (
  -- integer area resize of the 8-wide rows into 9 buckets: pixel x spans
  -- [9x, 9x+9), bucket j spans [8j, 8j+8) — same weights as _dhash_words
  SELECT asset_id, y AS i, j.j AS j,
         SUM(greatest(0, least(9 * x + 9, 8 * j.j + 8) - greatest(9 * x, 8 * j.j)) * g3) AS s
  FROM px, LATERAL unnest(generate_series(0, 8)) j(j)
  GROUP BY asset_id, y, j.j),
bits AS MATERIALIZED (
  SELECT a.asset_id, a.i, a.j, CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
  FROM cells a JOIN cells b ON b.asset_id = a.asset_id AND b.i = a.i AND b.j = a.j + 1
  WHERE a.j < 8),
words AS MATERIALIZED (
  SELECT asset_id,
         CAST(SUM(CASE WHEN i * 8 + j < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(i * 8 + j AS INT)) ELSE 0 END) AS BIGINT) AS w0,
         CAST(SUM(CASE WHEN i * 8 + j >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(i * 8 + j - 32 AS INT)) ELSE 0 END) AS BIGINT) AS w1
  FROM bits GROUP BY asset_id)
""".strip()

register(
    "q_multimodal_phash",
    lambda s, d: multimodal.image_dhash(
        multimodal.assets_from_documents(_docs(s, d))
    ),
    f"""
    WITH {_PHASH_WORDS_CTES}
    SELECT asset_id, w0, w1 FROM words
    """,
)

register(
    "q_multimodal_phash_dedup",
    lambda s, d: multimodal.image_phash_pairs(
        multimodal.assets_from_documents(_docs(s, d)), max_hamming=6
    ),
    f"""
    WITH {_PHASH_WORDS_CTES},
    banded AS MATERIALIZED (
      SELECT asset_id, b.b AS band,
             CASE WHEN b.b < 4 THEN (w0 >> CAST(b.b * 8 AS INT)) & 255
                  ELSE (w1 >> CAST((b.b - 4) * 8 AS INT)) & 255 END AS slice
      FROM words, LATERAL unnest(generate_series(0, 7)) b(b)),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.asset_id AS ia, b2.asset_id AS ib
      FROM banded a JOIN banded b2
        ON a.band = b2.band AND a.slice = b2.slice AND a.asset_id < b2.asset_id)
    SELECT c.ia AS asset_a, c.ib AS asset_b,
           CAST(bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) AS BIGINT) AS hamming
    FROM cand c
    JOIN words wa ON wa.asset_id = c.ia
    JOIN words wb ON wb.asset_id = c.ib
    WHERE bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) <= 6
    """,
)


# Audio temporal-dHash (the audio member of the perceptual-hash family):
# WAV payloads are the 256 zero-padded text bytes as 8-bit PCM, so the
# oracle rebuilds the exact samples and re-derives the integer 1-D area
# resize + loudness-gradient bits — full value-hash, like the image face.
_AUDIOHASH_WORDS_CTES = """
aud AS (SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 2),
smp AS MATERIALIZED (
  SELECT asset_id, p.i - 1 AS x,
         CASE WHEN length(text) >= p.i
              THEN unicode(substring(text, CAST(p.i AS INT), 1)) ELSE 0 END AS v
  FROM aud, LATERAL unnest(generate_series(1, 256)) p(i)),
acell AS MATERIALIZED (
  -- sample x spans [65x, 65x+65), bucket j spans [256j, 256j+256):
  -- the same LCM-scaled integer weights as _audio_dhash_words
  SELECT asset_id, j.j AS j,
         SUM(greatest(0, least(65 * x + 65, 256 * j.j + 256) - greatest(65 * x, 256 * j.j)) * v) AS s
  FROM smp, LATERAL unnest(generate_series(0, 64)) j(j)
  GROUP BY asset_id, j.j),
abit AS MATERIALIZED (
  SELECT a.asset_id, a.j AS k, CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
  FROM acell a JOIN acell b ON b.asset_id = a.asset_id AND b.j = a.j + 1
  WHERE a.j < 64),
words AS MATERIALIZED (
  SELECT asset_id,
         CAST(SUM(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS w0,
         CAST(SUM(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(k - 32 AS INT)) ELSE 0 END) AS BIGINT) AS w1
  FROM abit GROUP BY asset_id)
""".strip()

register(
    "q_multimodal_audiohash",
    lambda s, d: multimodal.audio_dhash(
        multimodal.assets_from_documents(_docs(s, d))
    ),
    f"""
    WITH {_AUDIOHASH_WORDS_CTES}
    SELECT asset_id, w0, w1 FROM words
    """,
)

register(
    "q_multimodal_audiohash_dedup",
    lambda s, d: multimodal.audio_phash_pairs(
        multimodal.assets_from_documents(_docs(s, d)), max_hamming=6
    ),
    f"""
    WITH {_AUDIOHASH_WORDS_CTES},
    banded AS MATERIALIZED (
      SELECT asset_id, b.b AS band,
             CASE WHEN b.b < 4 THEN (w0 >> CAST(b.b * 8 AS INT)) & 255
                  ELSE (w1 >> CAST((b.b - 4) * 8 AS INT)) & 255 END AS slice
      FROM words, LATERAL unnest(generate_series(0, 7)) b(b)),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.asset_id AS ia, b2.asset_id AS ib
      FROM banded a JOIN banded b2
        ON a.band = b2.band AND a.slice = b2.slice AND a.asset_id < b2.asset_id)
    SELECT c.ia AS asset_a, c.ib AS asset_b,
           CAST(bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) AS BIGINT) AS hamming
    FROM cand c
    JOIN words wa ON wa.asset_id = c.ia
    JOIN words wb ON wb.asset_id = c.ib
    WHERE bit_count(xor(wa.w0, wb.w0)) + bit_count(xor(wa.w1, wb.w1)) <= 6
    """,
)


def _louvain_invariants_q(s: SparkSession, d: str) -> DataFrame:
    """Louvain partition invariants with SQL-recomputed anchors: the node
    count is a hard value (distinct co-raters, recomputed by the oracle),
    and the coverage/quality booleans only come out TRUE if every graph
    node got exactly one label and the partition's modularity is strictly
    positive (the trivial one-community partition has Q = 0, so a
    collapsed Louvain flips the hash). The labels themselves stay
    rows-only (community ids are value-unstable across tie orders)."""
    comm, q = _louvain(s, d)
    return comm.agg(
        F.countDistinct("node_id").cast("long").alias("n_nodes"),
        (F.count(F.lit(1)) == F.countDistinct("node_id")).alias("one_label_per_node"),
    ).withColumn("q_positive", F.lit(bool(q > 0.0)))


register(
    "q_louvain_invariants",
    _louvain_invariants_q,
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        ce AS (SELECT a.user_id AS src FROM pos a JOIN pos b USING (isbn)
               WHERE a.user_id <> b.user_id GROUP BY a.user_id, b.user_id)
        SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
               TRUE AS one_label_per_node, TRUE AS q_positive
        FROM ce
        """
    ),
)


def _pipeline_invariants_q(s: SparkSession, d: str) -> DataFrame:
    """One invariant row over every pipeline stage (FastRP -> KNN ->
    Louvain -> recommenders), each field SQL-anchored or earned:
    embedding count and dims, KNN output contract (no self pairs, cutoff
    and top-k respected), community coverage over the exact co-rating
    node set, and the serving queries' LIMIT contracts. The embeddings/
    labels themselves stay rows-only (iterative float programs)."""
    res = _pipeline(s, d)
    ref = _ref(s, d)
    emb, sim, comm = res.embeddings, res.similar_to, res.communities
    e = emb.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min(F.size("embedding")).alias("dim_min"),
        F.max(F.size("embedding")).alias("dim_max"),
    ).first()
    sim_viol = sim.filter(
        (F.col("src") == F.col("dst"))
        | (F.col("similarity") > 1.000001)
        | (F.col("similarity") < 0.6 - 1e-6)
    ).count()
    sim_over = sim.groupBy("src").count().filter(F.col("count") > 20).count()
    c = comm.agg(
        F.countDistinct("user_id").cast("long").alias("n"),
        (F.count(F.lit(1)) == F.countDistinct("user_id")).alias("one"),
    ).first()
    knn_rec_n = recommend.recommend_books_knn(
        sim, ref.ratings, ref.books, UID, k=10
    ).count()
    comm_rec_n = recommend.recommend_books_community(
        _users_with_pipeline_community(s, d), ref.ratings, ref.books, UID, k=3
    ).count()
    return s.createDataFrame(
        [
            (
                e["n_users"],
                int(e["dim_min"]),
                int(e["dim_max"]),
                int(sim_viol),
                int(sim_over),
                c["n"],
                bool(c["one"]),
                bool(knn_rec_n <= 10),
                bool(comm_rec_n <= 3),
            )
        ],
        "n_users long, dim_min int, dim_max int, sim_violations long, "
        "sim_over_topk long, n_comm_nodes long, one_label_per_node boolean, "
        "knn_rec_within_k boolean, comm_rec_within_k boolean",
    )


register(
    "q_pipeline_invariants",
    _pipeline_invariants_q,
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        ce AS (SELECT a.user_id AS src FROM pos a JOIN pos b USING (isbn)
               WHERE a.user_id <> b.user_id GROUP BY a.user_id, b.user_id)
        SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM ratings) AS BIGINT) AS n_users,
               CAST(64 AS INT) AS dim_min, CAST(64 AS INT) AS dim_max,
               CAST(0 AS BIGINT) AS sim_violations, CAST(0 AS BIGINT) AS sim_over_topk,
               CAST((SELECT COUNT(DISTINCT src) FROM ce) AS BIGINT) AS n_comm_nodes,
               TRUE AS one_label_per_node, TRUE AS knn_rec_within_k,
               TRUE AS comm_rec_within_k
        """
    ),
)




# --- ALS matrix-factorization recommender (MLlib; rows-only + twin) ---------

_ALS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _als_recs(s: SparkSession, d: str) -> DataFrame:
    from .plans.als import als_recommendations

    key = (s.sparkContext.applicationId, d)
    res = _ALS_CACHE.get(key)
    if res is None:
        res = als_recommendations(_ref(s, d).ratings, k=3).cache()
        _ALS_CACHE[key] = res
    return res


def _als_q(s: SparkSession, d: str) -> DataFrame:
    """MLlib ALS top-3 recommendations (rows-only: block-parallel
    factorization is float-partitioning dependent; q_recsys_als_invariants
    is the driver-attestable twin — RMSE bar + contract checks)."""
    return _als_recs(s, d)


register("q_recsys_als", _als_q, None)


def _als_invariants_q(s: SparkSession, d: str) -> DataFrame:
    """ALS invariant row: user/item counts SQL-anchored; the factorization
    must beat the global-mean baseline on train RMSE (a broken solver
    cannot earn this TRUE); recommendations must respect the unseen-only
    anti-join and the per-user k cap."""
    from .plans.als import als_train_rmse

    ratings = _ref(s, d).ratings
    rmse, base, n_users, n_items = als_train_rmse(ratings)
    recs = _als_recs(s, d)
    seen_viol = recs.join(
        ratings.select("user_id", "isbn"), ["user_id", "isbn"], "left_semi"
    ).count()
    over_k = recs.groupBy("user_id").count().filter(F.col("count") > 3).count()
    return s.createDataFrame(
        [
            (
                int(n_users),
                int(n_items),
                bool(rmse < base),
                int(seen_viol),
                int(over_k),
            )
        ],
        "n_users long, n_items long, rmse_beats_baseline boolean, "
        "seen_violations long, over_k_users long",
    )


register(
    "q_recsys_als_invariants",
    _als_invariants_q,
    _q(
        """
        SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM ratings) AS BIGINT) AS n_users,
               CAST((SELECT COUNT(DISTINCT isbn) FROM ratings) AS BIGINT) AS n_items,
               TRUE AS rmse_beats_baseline,
               CAST(0 AS BIGINT) AS seen_violations,
               CAST(0 AS BIGINT) AS over_k_users
        """
    ),
)

_QCLF_CACHE: dict[tuple[str, str], DataFrame] = {}


def _quality_clf_scores(s: SparkSession, d: str) -> DataFrame:
    """One L-BFGS fit per (app, sf_dir), shared by the scores query and
    its invariants twin (same memoization contract as _ALS_CACHE;
    cleared by reset_caches so the bench re-pays the fit per pass)."""
    from .plans.quality_clf import quality_classifier_scores

    key = (s.sparkContext.applicationId, d)
    res = _QCLF_CACHE.get(key)
    if res is None:
        res = quality_classifier_scores(_docs(s, d), F.col("lang") == "en").cache()
        _QCLF_CACHE[key] = res
    return res


def _quality_clf_q(s: SparkSession, d: str) -> DataFrame:
    """CCNet-style learned quality filter: logistic regression on hashed
    token counts, English documents as the target domain — rows-only
    (L-BFGS treeAggregate float order); q_corpus_quality_clf_invariants
    is the attestable twin."""
    return _quality_clf_scores(s, d)


register("q_corpus_quality_clf", _quality_clf_q, None)


def _quality_clf_invariants_q(s: SparkSession, d: str) -> DataFrame:
    """Quality-classifier invariant row: corpus/label counts SQL-anchored;
    train accuracy must beat the majority-class baseline (earned — a
    broken trainer or feature hash cannot produce it); every score must
    be a valid probability; output stays 1:1 with the corpus."""
    scored = _quality_clf_scores(s, d)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").alias("pos"),
        F.sum(
            ((F.col("score") >= 0.5).cast("int") == F.col("label")).cast("long")
        ).alias("correct"),
        F.sum(((F.col("score") < 0) | (F.col("score") > 1)).cast("long")).alias(
            "invalid"
        ),
    ).first()
    n, pos = int(agg["n"]), int(agg["pos"])
    beats = int(agg["correct"]) > max(pos, n - pos)
    return s.createDataFrame(
        [(n, pos, bool(beats), int(agg["invalid"]))],
        "n_docs long, n_pos long, accuracy_beats_majority boolean, invalid_scores long",
    )


register(
    "q_corpus_quality_clf_invariants",
    _quality_clf_invariants_q,
    """
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM documents WHERE lang = 'en') AS BIGINT) AS n_pos,
           TRUE AS accuracy_beats_majority,
           CAST(0 AS BIGINT) AS invalid_scores
    """,
)


register(
    "q_events_transitions",
    lambda s, d: events.type_transitions(_ref(s, d).events),
    """
    SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events)
    WHERE to_type IS NOT NULL
    GROUP BY event_type, to_type
    """,
)




def _fpgrowth_q(s: SparkSession, d: str) -> DataFrame:
    """MLlib FP-Growth frequent itemsets (sizes 1-2, basket count >= 3)
    over positive-rating baskets — EXACT integer counts, so unlike the
    float-iterative MLlib surfaces this one value-hash checks directly
    against a self-join recount in SQL."""
    from .plans.fpgrowth import frequent_itemsets

    return frequent_itemsets(_ref(s, d).ratings, min_count=3, max_size=2)


register(
    "q_recsys_fpgrowth",
    _fpgrowth_q,
    _q(
        """
        , pos AS (SELECT DISTINCT user_id, isbn FROM ratings WHERE rating >= 6),
        s1 AS (
          SELECT isbn AS items, CAST(1 AS INT) AS size, CAST(COUNT(*) AS BIGINT) AS freq
          FROM pos GROUP BY isbn),
        s2 AS (
          SELECT a.isbn || ',' || b.isbn AS items, CAST(2 AS INT) AS size,
                 CAST(COUNT(*) AS BIGINT) AS freq
          FROM pos a JOIN pos b ON a.user_id = b.user_id AND a.isbn < b.isbn
          GROUP BY a.isbn, b.isbn)
        SELECT items, size, freq FROM (
          SELECT * FROM s1 UNION ALL SELECT * FROM s2)
        WHERE freq >= 3
        """
    ),
)




def _assoc_rules_q(s: SparkSession, d: str) -> DataFrame:
    """Single-antecedent association rules from the frequent pairs
    (confidence + lift) — MLlib's rule generation value-hash checked
    against the integer-count recount."""
    from .plans.fpgrowth import association_rules_pairs

    return association_rules_pairs(_ref(s, d).ratings, min_count=3, min_confidence=0.2)


register(
    "q_recsys_assoc_rules",
    _assoc_rules_q,
    _q(
        """
        , pos AS (SELECT DISTINCT user_id, isbn FROM ratings WHERE rating >= 6),
        nb AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n FROM pos),
        s1 AS (SELECT isbn, COUNT(*) AS f FROM pos GROUP BY isbn),
        s2 AS (
          SELECT a.isbn AS ia, b.isbn AS ib, COUNT(*) AS f
          FROM pos a JOIN pos b ON a.user_id = b.user_id AND a.isbn <> b.isbn
          GROUP BY a.isbn, b.isbn)
        SELECT s2.ia AS antecedent, s2.ib AS consequent,
               CAST(s2.f AS BIGINT) AS freq_pair,
               ROUND(CAST(s2.f AS DOUBLE) / fa.f, 6) AS confidence,
               ROUND((CAST(s2.f AS DOUBLE) / fa.f) / (fb.f / (SELECT n FROM nb)), 6) AS lift
        FROM s2
        JOIN s1 fa ON fa.isbn = s2.ia
        JOIN s1 fb ON fb.isbn = s2.ib
        WHERE s2.f >= 3 AND CAST(s2.f AS DOUBLE) / fa.f >= 0.2
        """
    ),
)




def _deepwalk_q(s: SparkSession, d: str) -> DataFrame:
    """DeepWalk vectors in driver-canonicalizable long form (rows-only:
    Word2Vec negative-sampling updates are float-order dependent;
    q_emb_deepwalk_invariants is the attestable twin)."""
    from .plans.graphs import walk_embeddings

    emb = walk_embeddings(_ref(s, d).ratings, dim=16)
    return emb.select(
        "node", F.posexplode("vector").alias("dim", "value")
    ).select("node", "dim", F.round("value", 6).alias("value"))


register("q_emb_deepwalk", _deepwalk_q, None)


def _deepwalk_invariants_q(s: SparkSession, d: str) -> DataFrame:
    """DeepWalk structural invariants, SQL-anchored: the vocabulary must
    be EXACTLY the distinct nodes the (hash-derandomized, oracle-checked)
    walk corpus visits, every vector must have the configured width, and
    all values must be finite."""
    from .plans.graphs import walk_embeddings

    emb = walk_embeddings(_ref(s, d).ratings, dim=16)
    flat = emb.select("node", F.explode("vector").alias("x"))
    return emb.agg(
        F.countDistinct("node").cast("long").alias("n_vocab"),
    ).crossJoin(
        flat.agg(
            (F.count(F.lit(1)) == F.countDistinct("node") * 16).alias("dims_ok"),
            (F.count(F.when(F.isnan("x") | F.col("x").isNull(), 1)) == 0).alias(
                "all_finite"
            ),
        )
    )


register(
    "q_emb_deepwalk_invariants",
    _deepwalk_invariants_q,
    "WITH base AS ({WALKS})\n"
    "SELECT CAST(COUNT(DISTINCT node) AS BIGINT) AS n_vocab, "
    "TRUE AS dims_ok, TRUE AS all_finite FROM base".replace(
        "{WALKS}", _WALKS_ORACLE
    ),
)


def _gopher_pages(s: SparkSession, d: str) -> DataFrame:
    """Line-bearing pages for the Gopher quality rules: the synthetic
    corpus carries no bullets/ellipses/symbols, so every rule would fire
    identically (degenerate hash). Each doc becomes one line with a
    deterministic doc_id-keyed mutation — bullet prefix, terminal '...',
    appended '#' symbols, letters→digits (alpha-word rule), appended
    required-stop-words — then groups of 8 join into pages, giving every
    signal a spread of fractional values. Both engines rebuild the
    construction deterministically (chained CASE, first match wins)."""
    docs = _docs(s, d)
    t = F.col("text")
    m = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("- "), t))
        .when(F.col("doc_id") % 5 == 1, F.concat(t, F.lit("...")))
        .when(F.col("doc_id") % 7 == 2, F.concat(t, F.lit(" ## #")))
        .when(F.col("doc_id") % 11 == 3, F.regexp_replace(t, "[a-z]", "7"))
        .when(F.col("doc_id") % 13 == 4, F.concat(t, F.lit(" of that have")))
        .otherwise(t)
        .alias("text"),
    )
    return (
        m.groupBy(F.expr("doc_id div 8").alias("sd_id"))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda x: x["text"],
                ),
            ).alias("text")
        )
        .select(F.col("sd_id").alias("doc_id"), "text")
    )


_GOPHER_SW_SQL = ", ".join(f"'{w}'" for w in textstats.GOPHER_STOPWORDS)

register(
    "q_text_gopher",
    lambda s, d: textstats.gopher_quality_signals(_gopher_pages(s, d), min_words=50),
    rf"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN '- ' || text
                  WHEN doc_id % 5 = 1 THEN text || '...'
                  WHEN doc_id % 7 = 2 THEN text || ' ## #'
                  WHEN doc_id % 11 = 3 THEN regexp_replace(text, '[a-z]', '7', 'g')
                  WHEN doc_id % 13 = 4 THEN text || ' of that have'
                  ELSE text END AS text
      FROM documents),
    pg AS (
      SELECT doc_id // 8 AS sd_id,
             string_agg(text, chr(10) ORDER BY doc_id) AS text
      FROM m GROUP BY doc_id // 8),
    sig AS (
      SELECT sd_id AS doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
             list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                         l -> l <> '') AS ls,
             (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '...', ''))) / 3 AS sym
      FROM pg),
    base AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             ROUND(CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w), 6)
               AS mean_word_len,
             ROUND(sym / len(w), 6) AS symbol_word_ratio,
             CASE WHEN len(ls) > 0
                  THEN ROUND(CAST(len(list_filter(ls,
                         l -> starts_with(l, '•') OR starts_with(l, '- ')
                              OR starts_with(l, '* '))) AS DOUBLE) / len(ls), 6)
                  ELSE 0.0 END AS bullet_line_fraction,
             CASE WHEN len(ls) > 0
                  THEN ROUND(CAST(len(list_filter(ls,
                         l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE)
                       / len(ls), 6)
                  ELSE 0.0 END AS ellipsis_line_fraction,
             ROUND(CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                   / len(w), 6) AS alpha_word_ratio,
             CAST(len(list_distinct(list_filter(w,
                    t -> list_contains([{_GOPHER_SW_SQL}], t)))) AS BIGINT)
               AS n_required_stopwords
      FROM sig)
    SELECT *,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_word_ratio <= 0.1
            AND bullet_line_fraction <= 0.9
            AND ellipsis_line_fraction <= 0.3
            AND alpha_word_ratio >= 0.8
            AND n_required_stopwords >= 2) AS gopher_pass
    FROM base
    """,
)


def _ingest_bm25_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental BM25 model maintenance: the corpus arrives as three
    disjoint batches (doc_id % 3), each contributing a (token, count,
    n_docs) vocabulary delta (df = n_docs is additive in an append-only
    ingest) and a one-row (n_docs, n_tokens) scalar delta (N, avgdl);
    scoring the corpus against the consolidated model must equal direct
    bm25_scores bit-for-bit. Oracle = the direct whole-corpus BM25
    derivation (the same SQL as q_text_bm25)."""
    docs = _docs(s, d)
    tok_deltas, stat_deltas = None, None
    for i in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == i)
        td = textstats.token_count_table(batch)
        sd = batch.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")))
            .cast("long")
            .alias("n_tokens"),
        )
        tok_deltas = td if tok_deltas is None else tok_deltas.unionByName(td)
        stat_deltas = sd if stat_deltas is None else stat_deltas.unionByName(sd)
    model = textstats.consolidate_token_counts(tok_deltas)
    stats = stat_deltas.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    return textstats.bm25_scores_from_stats(
        docs, model, stats, _BM25_TERMS, _BM25_K1, _BM25_B, top_n=100
    )


register(
    "q_ingest_bm25",
    _ingest_bm25_q,
    _bm25_oracle(_BM25_TERMS, _BM25_K1, _BM25_B),
)


def _ingest_quality_hist_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental quality monitoring: three disjoint batches each
    contribute a per-source stop-word-decile histogram delta; the
    consolidated sum must equal the direct whole-corpus histogram."""
    docs = _docs(s, d)
    deltas = None
    for i in range(3):
        delta = textstats.quality_hist_table(docs.filter(F.col("doc_id") % 3 == i))
        deltas = delta if deltas is None else deltas.unionByName(delta)
    return textstats.consolidate_quality_hist(deltas)


register(
    "q_ingest_quality_hist",
    _ingest_quality_hist_q,
    _q_docs(
        f"""
        , tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        agg AS (
          SELECT doc_id, COUNT(*) AS n,
                 SUM(CASE WHEN token IN ({_SW_EN}) THEN 1 ELSE 0 END) AS s
          FROM tokd GROUP BY doc_id)
        SELECT d.source,
               LEAST(CAST(floor(10.0 * a.s / a.n) AS BIGINT), 9) AS q_bucket,
               COUNT(*) AS n_docs
        FROM agg a JOIN documents d USING (doc_id)
        GROUP BY 1, 2
        """
    ),
)


# MMR-diversified top-k: greedy selection is sequential by nature, so the
# oracle unrolls the k=3 rounds explicitly — round 1 is the plain relevance
# argmax, later rounds subtract the max candidate-to-selected similarity
# (all sims 6dp-rounded BEFORE any comparison, ties on neighbor_id — the
# same determinism discipline as every other top-k boundary here).
register(
    "q_simsearch_mmr",
    lambda s, d: simsearch.mmr_rerank(
        _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
        _ref(s, d).embeddings,
        k=3,
        pool=10,
        lam=0.7,
        lam_c=0.3,
    ),
    _q_vec(
        f"""
        , pairsq AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS simq
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        pool AS (
          SELECT query_id, neighbor_id, simq FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY simq DESC, neighbor_id) AS rn
            FROM pairsq) WHERE rn <= 10),
        cc AS (
          SELECT p1.query_id, p1.neighbor_id AS id_a, p2.neighbor_id AS id_b, {_COS} AS sim
          FROM pool p1
          JOIN pool p2 ON p1.query_id = p2.query_id AND p1.neighbor_id <> p2.neighbor_id
          JOIN vec a ON a.vec_id = p1.neighbor_id
          JOIN vec b ON b.vec_id = p2.neighbor_id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY 1, 2, 3),
        s1 AS (SELECT query_id, neighbor_id, simq, 0.7 * simq AS score FROM pool),
        p1 AS (SELECT query_id, neighbor_id, simq, score FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                              ORDER BY score DESC, neighbor_id) AS rn
                 FROM s1) WHERE rn = 1),
        s2 AS (
          SELECT p.query_id, p.neighbor_id, p.simq, 0.7 * p.simq - 0.3 * cc.sim AS score
          FROM pool p
          JOIN p1 ON p1.query_id = p.query_id AND p.neighbor_id <> p1.neighbor_id
          JOIN cc ON cc.query_id = p.query_id AND cc.id_a = p.neighbor_id
                 AND cc.id_b = p1.neighbor_id),
        p2 AS (SELECT query_id, neighbor_id, simq, score FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                              ORDER BY score DESC, neighbor_id) AS rn
                 FROM s2) WHERE rn = 1),
        s3 AS (
          SELECT p.query_id, p.neighbor_id, p.simq,
                 0.7 * p.simq - 0.3 * GREATEST(c1.sim, c2.sim) AS score
          FROM pool p
          JOIN p1 ON p1.query_id = p.query_id AND p.neighbor_id <> p1.neighbor_id
          JOIN p2 ON p2.query_id = p.query_id AND p.neighbor_id <> p2.neighbor_id
          JOIN cc c1 ON c1.query_id = p.query_id AND c1.id_a = p.neighbor_id
                    AND c1.id_b = p1.neighbor_id
          JOIN cc c2 ON c2.query_id = p.query_id AND c2.id_a = p.neighbor_id
                    AND c2.id_b = p2.neighbor_id),
        p3 AS (SELECT query_id, neighbor_id, simq, score FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                              ORDER BY score DESC, neighbor_id) AS rn
                 FROM s3) WHERE rn = 1)
        SELECT query_id, 1 AS rank, neighbor_id, simq AS similarity,
               ROUND(score, 7) AS mmr_score FROM p1
        UNION ALL
        SELECT query_id, 2, neighbor_id, simq, ROUND(score, 7) FROM p2
        UNION ALL
        SELECT query_id, 3, neighbor_id, simq, ROUND(score, 7) FROM p3
        """
    ),
)


def _ingest_centroids_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental centroid maintenance (mini-batch k-means step with
    frozen assignment centroids): the embedding table arrives as three
    disjoint batches (vec_id % 3), each assigned against the SAME frozen
    centroids (the 4 smallest vec_ids) and contributing a fixed-point
    first-moment delta; consolidation must equal a single-pass mean,
    bit-for-bit (integer sums are associative). Oracle = the direct
    assignment + mean derivation."""
    emb = _ref(s, d).embeddings
    cent = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    deltas = None
    for i in range(3):
        delta = simsearch.centroid_delta_table(
            emb.filter(F.col("vec_id") % 3 == i), cent
        )
        deltas = delta if deltas is None else deltas.unionByName(delta)
    return simsearch.consolidate_centroids(deltas)


register(
    "q_ingest_centroids",
    _ingest_centroids_q,
    _q_vec(
        f"""
        , cent AS (SELECT vec_id AS cid, v AS cv FROM vec WHERE vec_id < 4),
        d AS (
          SELECT v.vec_id, c.cid,
                 ROUND(SUM((v.v[t.i] - c.cv[t.i]) * (v.v[t.i] - c.cv[t.i])), 6) AS dist
          FROM vec v, cent c, range(1, 65) t(i)
          GROUP BY 1, 2),
        asg AS (
          SELECT vec_id, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) AS rn
            FROM d) WHERE rn = 1)
        SELECT a.cid, CAST(t.i - 1 AS INT) AS dim,
               ROUND(SUM(ROUND(v.v[t.i] * {1 << 20}.0)) / {1 << 20}.0 / COUNT(*), 6)
                 AS centroid,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM asg a JOIN vec v USING (vec_id)
        CROSS JOIN range(1, 65) t(i)
        GROUP BY 1, 2
        """
    ),
)


def _ingest_retract_q(s: SparkSession, d: str) -> DataFrame:
    """Retraction face of the incremental-maintenance algebra: all three
    batches are appended, then batch 1 is RETRACTED by appending its
    negated delta (etl._negate — integer counts form a group, so removal
    needs no corpus rescan); the consolidated vocabulary must equal a
    direct rebuild over the surviving documents bit-for-bit. Oracle =
    the direct derivation with batch 1's documents excluded."""
    docs = _docs(s, d)
    deltas = None
    for i in range(3):
        delta = textstats.token_count_table(docs.filter(F.col("doc_id") % 3 == i))
        deltas = delta if deltas is None else deltas.unionByName(delta)
    # the retraction delta: batch 1's counts, negated (same table the
    # etl.vocab_delta_append(retract=True) face publishes)
    neg = textstats.token_count_table(docs.filter(F.col("doc_id") % 3 == 1)).select(
        "token", (-F.col("count")).alias("count"), (-F.col("n_docs")).alias("n_docs")
    )
    return textstats.rank_vocabulary(
        textstats.consolidate_token_counts(deltas.unionByName(neg)),
        max_size=2000,
        min_count=2,
    )


register(
    "q_ingest_retract",
    _ingest_retract_q,
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents WHERE doc_id % 3 <> 1
    ),
    tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
    counts AS (
      SELECT token, COUNT(*) AS count, COUNT(DISTINCT doc_id) AS n_docs
      FROM tokd GROUP BY token HAVING COUNT(*) >= 2)
    SELECT token_id, token, count, n_docs FROM (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1 AS BIGINT) AS token_id,
             token, count, n_docs
      FROM counts)
    WHERE token_id < 2000
    """,
)


_CMS_TERMS = ["the", "join", "window", "hash", "data", "sort", "merge", "zz_absent"]


def _ingest_cms_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental count-min sketch: three disjoint batches each append a
    bounded (row, bucket, c) delta; point estimates off the consolidated
    sketch must equal the single-pass sketch's (integer cells sum
    associatively). Oracle = the sketch built directly in SQL and probed
    with the same md5 bucket arithmetic."""
    from .operators import sketches

    docs = _docs(s, d)
    deltas = None
    for i in range(3):
        delta = sketches.cms_delta_table(docs.filter(F.col("doc_id") % 3 == i))
        deltas = delta if deltas is None else deltas.unionByName(delta)
    return sketches.cms_point_estimates(sketches.consolidate_cms(deltas), _CMS_TERMS)


_CMS_TERM_VALUES = ", ".join(f"('{t}')" for t in _CMS_TERMS)

register(
    "q_ingest_cms",
    _ingest_cms_q,
    _q_docs(
        f"""
        , tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        sk AS (
          SELECT t.r AS row,
                 CAST(('0x' || substr(md5(token || '#' || CAST(t.r + 1 AS VARCHAR)), 1, 8))
                      AS BIGINT) % 1024 AS bucket,
                 COUNT(*) AS c
          FROM tokd, range(0, 4) t(r) GROUP BY 1, 2),
        terms(token) AS (VALUES {_CMS_TERM_VALUES}),
        probe AS (
          SELECT token, t.r AS row,
                 CAST(('0x' || substr(md5(token || '#' || CAST(t.r + 1 AS VARCHAR)), 1, 8))
                      AS BIGINT) % 1024 AS bucket
          FROM terms, range(0, 4) t(r))
        SELECT token, CAST(MIN(COALESCE(s.c, 0)) AS BIGINT) AS est
        FROM probe p LEFT JOIN sk s USING (row, bucket)
        GROUP BY token
        """
    ),
)


def _ingest_hll_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental HyperLogLog registers over the event stream's user
    ids: three disjoint batches max-merged must equal the single-pass
    register table (max is associative/commutative/idempotent — the
    monoid face of the sidecar algebra; retraction is impossible here
    and the API says so). Oracle = the direct register derivation."""
    from .operators import sketches

    ev = _ref(s, d).events
    deltas = None
    for i in range(3):
        delta = sketches.hll_register_table(
            ev.filter(F.col("event_id") % 3 == i), "user_id"
        )
        deltas = delta if deltas is None else deltas.unionByName(delta)
    return sketches.hll_merge(deltas)


register(
    "q_ingest_hll",
    _ingest_hll_q,
    """
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events),
    r AS (
      SELECT h % 1024 AS bucket,
             CASE WHEN (h >> 10) = 0 THEN 51
                  ELSE 51 - length(bin(h >> 10)) END AS rho
      FROM h)
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(MAX(rho) AS BIGINT) AS max_rho
    FROM r GROUP BY bucket
    """,
)


def _ingest_bloom_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental Bloom-filter maintenance over document fingerprints
    (the ingest-dedup pre-filter): three disjoint batches OR-merged must
    answer membership exactly like a single-pass filter — probed with
    every 10th document's fingerprint (present ⇒ TRUE, Bloom has no
    false negatives) plus 20 synthetic absent keys (almost surely FALSE
    at this fill factor; whatever the filter answers, the oracle answers
    identically because the bit arithmetic is shared md5)."""
    from .functions.text import canonical_fingerprint
    from .operators import sketches

    docs = _docs(s, d).select(
        "doc_id", canonical_fingerprint(F.col("text")).alias("fingerprint")
    )
    deltas = None
    for i in range(3):
        delta = sketches.bloom_delta_table(
            docs.filter(F.col("doc_id") % 3 == i), "fingerprint"
        )
        deltas = delta if deltas is None else deltas.unionByName(delta)
    bloom = sketches.bloom_merge(deltas)
    probes = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("fingerprint")
        .unionByName(
            s.range(20).select(
                F.concat(F.lit("absent-"), F.col("id").cast("string")).alias(
                    "fingerprint"
                )
            )
        )
    )
    return sketches.bloom_maybe_contains(bloom, probes, "fingerprint")


register(
    "q_ingest_bloom",
    _ingest_bloom_q,
    _q_docs(
        """
        , fp AS (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' '))
                   AS fingerprint
          FROM norm),
        pos AS (
          SELECT CAST(('0x' || substr(md5(fingerprint || '#' || CAST(t.r + 11 AS VARCHAR)), 1, 8))
                      AS BIGINT) % 65536 AS pos
          FROM fp, range(0, 4) t(r)),
        bloom AS (
          SELECT pos // 63 AS word,
                 bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS bits
          FROM pos GROUP BY 1),
        probes AS (
          SELECT fingerprint AS key FROM fp WHERE doc_id % 10 = 0
          UNION ALL
          SELECT 'absent-' || CAST(g.i AS VARCHAR) FROM range(0, 20) g(i)),
        pp AS (
          SELECT key,
                 CAST(('0x' || substr(md5(key || '#' || CAST(t.r + 11 AS VARCHAR)), 1, 8))
                      AS BIGINT) % 65536 AS pos
          FROM probes, range(0, 4) t(r))
        SELECT key,
               CAST(MIN(CASE WHEN (COALESCE(b.bits, 0)
                                   & (1::BIGINT << CAST(pp.pos % 63 AS INT))) <> 0
                             THEN 1 ELSE 0 END) AS BOOLEAN) AS maybe_present
        FROM pp LEFT JOIN bloom b ON b.word = pp.pos // 63
        GROUP BY key
        """
    ),
)


# sentence segmentation over the punctuation-bearing C4 page fixture (the
# raw synthetic corpus has no terminals — every doc would be one sentence,
# a degenerate hash)
register(
    "q_text_sentences",
    lambda s, d: textstats.split_sentences(_c4_pages(s, d)),
    r"""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN text || '.'
               WHEN 1 THEN text || '?'
               WHEN 2 THEN array_to_string(list_slice(
                             string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
                             1, 3), ' ') || ' done.'
               ELSE text || ' javascript.'
             END AS text
      FROM documents),
    pg AS (
      SELECT doc_id // 8 AS sd_id,
             string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS page
      FROM m GROUP BY doc_id // 8),
    pages AS (
      SELECT sd_id AS doc_id,
             page
             || CASE WHEN sd_id % 7 = 0
                     THEN chr(10) || chr(10) || 'lorem ipsum dolor sit.'
                     ELSE '' END
             || CASE WHEN sd_id % 5 = 0
                     THEN chr(10) || chr(10) || 'this page has a { brace }.'
                     ELSE '' END AS text
      FROM pg),
    sents AS (
      SELECT doc_id,
             list_filter(list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                                        x -> trim(x)),
                         x -> x <> '') AS ss
      FROM pages)
    SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS sent_idx, ss[g.i] AS sentence
    FROM sents, LATERAL unnest(generate_series(1, len(ss))) g(i)
    """,
)


def _ingest_lm_q(s: SparkSession, d: str) -> DataFrame:
    """Incremental LM-filter model: three disjoint batches contribute
    character-bigram count deltas; scoring the corpus against the
    consolidated model must equal direct lm_bigram_scores (integer
    counts → identical log-probabilities). Oracle = the direct
    whole-corpus derivation (same SQL as q_text_lm_score)."""
    docs = _docs(s, d)
    deltas = None
    for i in range(3):
        delta = textstats.bigram_count_table(docs.filter(F.col("doc_id") % 3 == i))
        deltas = delta if deltas is None else deltas.unionByName(delta)
    return textstats.lm_scores_from_counts(
        docs, textstats.consolidate_bigram_counts(deltas)
    )


register(
    "q_ingest_lm",
    _ingest_lm_q,
    _q_docs(
        """
        , base AS (SELECT doc_id, norm FROM norm WHERE length(norm) >= 2),
        grams AS (
          SELECT doc_id, unnest([substr(norm, i, 2) for i in range(1, length(norm))]) AS bigram
          FROM base),
        big AS (SELECT bigram, COUNT(*) AS cnt FROM grams GROUP BY bigram),
        pre AS (SELECT substr(bigram, 1, 1) AS c1, SUM(cnt) AS tot FROM big GROUP BY 1),
        model AS (
          SELECT bigram, log2(CAST(cnt AS DOUBLE) / tot) AS lp
          FROM big JOIN pre ON substr(big.bigram, 1, 1) = pre.c1)
        SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(lp), 6) AS lm_score
        FROM grams JOIN model USING (bigram)
        GROUP BY doc_id
        """
    ),
)


register(
    "q_ingest_drift",
    # the doc_id%3==0 slice plays the incoming batch, the full corpus the
    # maintained baseline — per-source KL over the quality-decile histogram
    lambda s, d: textstats.quality_drift_report(
        _docs(s, d).filter(F.col("doc_id") % 3 == 0), _docs(s, d)
    ),
    _q_docs(
        f"""
        , tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        agg AS (
          SELECT doc_id, COUNT(*) AS n,
                 SUM(CASE WHEN token IN ({_SW_EN}) THEN 1 ELSE 0 END) AS s
          FROM tokd GROUP BY doc_id),
        hist AS (
          SELECT d.source, d.doc_id,
                 LEAST(CAST(floor(10.0 * a.s / a.n) AS BIGINT), 9) AS q_bucket
          FROM agg a JOIN documents d USING (doc_id)),
        bh AS (SELECT source, q_bucket, COUNT(*) AS cb FROM hist
               WHERE doc_id % 3 = 0 GROUP BY 1, 2),
        ch AS (SELECT source, q_bucket, COUNT(*) AS cc FROM hist GROUP BY 1, 2),
        bt AS (SELECT source, SUM(cb) AS nb FROM bh GROUP BY source),
        ct AS (SELECT source, SUM(cc) AS nc FROM ch GROUP BY source),
        spine AS (
          SELECT DISTINCT ch.source, g.i AS q_bucket
          FROM ch, range(0, 10) g(i)),
        j AS (
          SELECT sp.source,
                 COALESCE(bh.cb, 0) AS cb, COALESCE(ch.cc, 0) AS cc,
                 COALESCE(bt.nb, 0) AS nb, ct.nc AS nc
          FROM spine sp
          LEFT JOIN bh ON bh.source = sp.source AND bh.q_bucket = sp.q_bucket
          LEFT JOIN ch ON ch.source = sp.source AND ch.q_bucket = sp.q_bucket
          LEFT JOIN bt ON bt.source = sp.source
          JOIN ct ON ct.source = sp.source)
        SELECT source, CAST(MAX(nb) AS BIGINT) AS n_docs,
               ROUND(SUM((CAST(cb + 1 AS DOUBLE) / (nb + 10))
                         * ln((CAST(cb + 1 AS DOUBLE) / (nb + 10))
                              / (CAST(cc + 1 AS DOUBLE) / (nc + 10)))), 6) AS kl
        FROM j GROUP BY source
        """
    ),
)


# The quality-filter stack's shared oracle CTEs: raw integer signal counts
# per doc, then each rule as an EXACT BIGINT cross-multiplication at
# textstats.FILTER_RULE_SCALE — no double threshold compares, no ROUND, no
# LATERAL VALUES (round-7 VERDICT item 1: the driver-red hash row was a
# double-vs-double threshold somewhere in the driver's engine pair; this
# representation leaves nothing version-sensitive to disagree on). The
# integer thresholds are the SAME Python constants the Spark operator uses.
_FILTER_RULE_SQL = {
    "f_too_short": "n_tokens < 15",
    "f_too_long": "n_tokens > 300",
    "f_word_len": (
        f"total_token_len * {textstats.FILTER_RULE_SCALE} < n_tokens * "
        f"{textstats._ratio_threshold_int(3.0)} OR total_token_len * "
        f"{textstats.FILTER_RULE_SCALE} > n_tokens * {textstats._ratio_threshold_int(10.0)}"
    ),
    "f_stopword_floor": (
        f"stop_hits * {textstats.FILTER_RULE_SCALE} < n_tokens * "
        f"{textstats._ratio_threshold_int(0.05)}"
    ),
    "f_top_token": (
        f"top_token_count * {textstats.FILTER_RULE_SCALE} > n_tokens * "
        f"{textstats._ratio_threshold_int(0.2)}"
    ),
    "f_dup_2gram": (
        f"dup_2gram_positions * {textstats.FILTER_RULE_SCALE} > "
        f"total_2gram_positions * {textstats._ratio_threshold_int(0.3)}"
    ),
}

_FILTER_VERDICTS_CTES = f"""
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        q AS (
          SELECT doc_id, COUNT(*) AS n_tokens,
                 SUM(length(token)) AS total_token_len,
                 SUM(CASE WHEN token IN ({_SW_EN}) THEN 1 ELSE 0 END) AS stop_hits
          FROM tok GROUP BY doc_id),
        tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        tt AS (SELECT doc_id, MAX(c) AS top_token_count FROM tc GROUP BY doc_id),
        g2 AS (
          SELECT doc_id, array_to_string(list_slice(t, g.i, g.i + 1), ' ') AS gram
          FROM toks, LATERAL unnest(generate_series(1, greatest(len(t) - 1, 1))) g(i)),
        gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
        gg AS (SELECT doc_id,
                      SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_2gram_positions,
                      SUM(c) AS total_2gram_positions
               FROM gc GROUP BY doc_id),
        sig AS (
          SELECT q.doc_id,
                 CAST(q.n_tokens AS BIGINT) AS n_tokens,
                 CAST(q.total_token_len AS BIGINT) AS total_token_len,
                 CAST(q.stop_hits AS BIGINT) AS stop_hits,
                 CAST(tt.top_token_count AS BIGINT) AS top_token_count,
                 CAST(gg.dup_2gram_positions AS BIGINT) AS dup_2gram_positions,
                 CAST(gg.total_2gram_positions AS BIGINT) AS total_2gram_positions
          FROM q JOIN tt USING (doc_id) JOIN gg USING (doc_id)),
        verdicts AS (
          SELECT *,
                 {", ".join(f"CASE WHEN {cond} THEN 1 ELSE 0 END AS {name}"
                            for name, cond in _FILTER_RULE_SQL.items())},
                 CASE WHEN {" OR ".join(f"({c})" for c in _FILTER_RULE_SQL.values())}
                      THEN 1 ELSE 0 END AS f_any
          FROM sig)
"""

register(
    "q_corpus_filter_flags",
    lambda s, d: textstats.filter_flags(_docs(s, d)),
    _q_docs(
        _FILTER_VERDICTS_CTES
        + """
        SELECT doc_id, n_tokens, total_token_len, stop_hits, top_token_count,
               dup_2gram_positions, total_2gram_positions,
               CAST(f_too_short AS BIGINT) AS f_too_short,
               CAST(f_too_long AS BIGINT) AS f_too_long,
               CAST(f_word_len AS BIGINT) AS f_word_len,
               CAST(f_stopword_floor AS BIGINT) AS f_stopword_floor,
               CAST(f_top_token AS BIGINT) AS f_top_token,
               CAST(f_dup_2gram AS BIGINT) AS f_dup_2gram,
               CAST(f_any AS BIGINT) AS f_any
        FROM verdicts
        """
    ),
)

register(
    "q_corpus_filter_report",
    lambda s, d: textstats.filter_ablation_report(_docs(s, d)),
    _q_docs(
        _FILTER_VERDICTS_CTES
        + """
        , wide AS (
          SELECT COUNT(*) AS n,
                 SUM(f_too_short) AS f_too_short, SUM(f_too_long) AS f_too_long,
                 SUM(f_word_len) AS f_word_len,
                 SUM(f_stopword_floor) AS f_stopword_floor,
                 SUM(f_top_token) AS f_top_token, SUM(f_dup_2gram) AS f_dup_2gram,
                 SUM(f_any) AS f_any
          FROM verdicts)
        SELECT 'too_short' AS rule, CAST(f_too_short AS BIGINT) AS n_failed,
               ROUND(f_too_short * 1.0 / n, 6) AS fail_rate FROM wide
        UNION ALL SELECT 'too_long', CAST(f_too_long AS BIGINT),
               ROUND(f_too_long * 1.0 / n, 6) FROM wide
        UNION ALL SELECT 'word_len', CAST(f_word_len AS BIGINT),
               ROUND(f_word_len * 1.0 / n, 6) FROM wide
        UNION ALL SELECT 'stopword_floor', CAST(f_stopword_floor AS BIGINT),
               ROUND(f_stopword_floor * 1.0 / n, 6) FROM wide
        UNION ALL SELECT 'top_token', CAST(f_top_token AS BIGINT),
               ROUND(f_top_token * 1.0 / n, 6) FROM wide
        UNION ALL SELECT 'dup_2gram', CAST(f_dup_2gram AS BIGINT),
               ROUND(f_dup_2gram * 1.0 / n, 6) FROM wide
        UNION ALL SELECT 'any', CAST(f_any AS BIGINT),
               ROUND(f_any * 1.0 / n, 6) FROM wide
        """
    ),
)


# ANN recall evaluation: the acceptance metric for every approximate
# similarity path — hyperplane-LSH top-10 scored against the exact top-10
# (the same parameterizations q_simsearch_topk / q_simsearch_lsh attest
# individually; this query value-hashes their AGREEMENT per query)
register(
    "q_simsearch_recall",
    lambda s, d: simsearch.ann_recall(
        simsearch.topk_bruteforce(
            _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
            _ref(s, d).embeddings,
            k=10,
        ),
        simsearch.topk_hyperplane_lsh(
            _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
            _ref(s, d).embeddings,
            k=10,
            num_planes=4,
            num_tables=4,
            seed=123,
            dim=64,
        ),
    ),
    _q_vec(
        f"""
        , pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY similarity DESC, neighbor_id) AS rn
            FROM pairs) WHERE rn <= 10),
        planes(tid, pid, pv) AS (VALUES {_PLANES_VALUES}),
        dots AS (
          SELECT v.vec_id, p.tid, p.pid, SUM(v.v[t.i] * p.pv[t.i]) AS d
          FROM vec v, planes p, range(1, 65) t(i)
          GROUP BY 1, 2, 3),
        buckets AS (
          SELECT vec_id, tid,
                 CAST(SUM(CASE WHEN d >= 0 THEN (1 << pid) ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id, tid),
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM buckets q
          JOIN buckets c ON q.tid = c.tid AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 10),
        cpairs AS (
          SELECT cand.query_id, cand.neighbor_id, {_COS} AS similarity
          FROM cand
          JOIN vec a ON a.vec_id = cand.query_id
          JOIN vec b ON b.vec_id = cand.neighbor_id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY 1, 2),
        approx AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY similarity DESC, neighbor_id) AS rn
            FROM cpairs) WHERE rn <= 10),
        hits AS (
          SELECT e.query_id, COUNT(*) AS n_hit
          FROM exact e JOIN approx a USING (query_id, neighbor_id)
          GROUP BY e.query_id),
        totals AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id)
        SELECT t.query_id, CAST(t.n_exact AS BIGINT) AS n_exact,
               CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
               ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_exact, 6) AS recall
        FROM totals t LEFT JOIN hits h USING (query_id)
        """
    ),
)


def _ingest_events_q(s: SparkSession, d: str) -> DataFrame:
    """The events-table instance of the additive sidecar algebra: hourly
    (window, event_type) counts from three disjoint batches consolidate
    into exactly the whole-stream rollup (counts only — value sums are
    floats, whose addition is NOT associative, so they stay out of the
    bit-identical contract by design; see the centroid sidecar's
    fixed-point trick for when a float sum must ride along)."""
    ev = _ref(s, d).events
    deltas = None
    for i in range(3):
        delta = events.tumbling_counts(
            ev.filter(F.col("event_id") % 3 == i), minutes=60
        ).select("window_start_us", "event_type", "n")
        deltas = delta if deltas is None else deltas.unionByName(delta)
    return deltas.groupBy("window_start_us", "event_type").agg(
        F.sum("n").cast("long").alias("n")
    )


register(
    "q_ingest_events",
    _ingest_events_q,
    """
    SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)


# Reciprocal-rank fusion of the exact and LSH retrievers — the hybrid-
# retrieval merge; ranks are integers so the fused score is two
# correctly-rounded doubles added once, bit-identical cross-engine.
register(
    "q_simsearch_rrf",
    lambda s, d: simsearch.rrf_fuse(
        simsearch.topk_bruteforce(
            _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
            _ref(s, d).embeddings,
            k=10,
        ),
        simsearch.topk_hyperplane_lsh(
            _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
            _ref(s, d).embeddings,
            k=10,
            num_planes=4,
            num_tables=4,
            seed=123,
            dim=64,
        ),
        k=5,
        c=60,
    ),
    _q_vec(
        f"""
        , pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        exact AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY similarity DESC, neighbor_id) AS ra
          FROM pairs QUALIFY ra <= 10),
        planes(tid, pid, pv) AS (VALUES {_PLANES_VALUES}),
        dots AS (
          SELECT v.vec_id, p.tid, p.pid, SUM(v.v[t.i] * p.pv[t.i]) AS d
          FROM vec v, planes p, range(1, 65) t(i)
          GROUP BY 1, 2, 3),
        buckets AS (
          SELECT vec_id, tid,
                 CAST(SUM(CASE WHEN d >= 0 THEN (1 << pid) ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id, tid),
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM buckets q
          JOIN buckets c ON q.tid = c.tid AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 10),
        cpairs AS (
          SELECT cand.query_id, cand.neighbor_id, {_COS} AS similarity
          FROM cand
          JOIN vec a ON a.vec_id = cand.query_id
          JOIN vec b ON b.vec_id = cand.neighbor_id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY 1, 2),
        approx AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY similarity DESC, neighbor_id) AS rb
          FROM cpairs QUALIFY rb <= 10),
        merged AS (
          SELECT COALESCE(e.query_id, a.query_id) AS query_id,
                 COALESCE(e.neighbor_id, a.neighbor_id) AS neighbor_id,
                 COALESCE(CAST(1.0 AS DOUBLE) / (60 + e.ra), 0.0)
                 + COALESCE(CAST(1.0 AS DOUBLE) / (60 + a.rb), 0.0) AS s
          FROM exact e FULL OUTER JOIN approx a
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id)
        SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id,
               ROUND(s, 6) AS rrf_score
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, neighbor_id) AS rn
          FROM merged) WHERE rn <= 5
        """
    ),
)


# nDCG of the LSH retriever against the exact one — recall's positional
# companion (misses at rank 1 cost more than at rank 10)
register(
    "q_simsearch_ndcg",
    lambda s, d: simsearch.ann_ndcg(
        simsearch.topk_bruteforce(
            _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
            _ref(s, d).embeddings,
            k=10,
        ),
        simsearch.topk_hyperplane_lsh(
            _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
            _ref(s, d).embeddings,
            k=10,
            num_planes=4,
            num_tables=4,
            seed=123,
            dim=64,
        ),
        k=10,
    ),
    _q_vec(
        f"""
        , pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        exact AS (
          SELECT query_id, neighbor_id, similarity AS gain,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY similarity DESC, neighbor_id) AS re
          FROM pairs QUALIFY re <= 10),
        planes(tid, pid, pv) AS (VALUES {_PLANES_VALUES}),
        dots AS (
          SELECT v.vec_id, p.tid, p.pid, SUM(v.v[t.i] * p.pv[t.i]) AS d
          FROM vec v, planes p, range(1, 65) t(i)
          GROUP BY 1, 2, 3),
        buckets AS (
          SELECT vec_id, tid,
                 CAST(SUM(CASE WHEN d >= 0 THEN (1 << pid) ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id, tid),
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM buckets q
          JOIN buckets c ON q.tid = c.tid AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
          WHERE q.vec_id < 10),
        cpairs AS (
          SELECT cand.query_id, cand.neighbor_id, {_COS} AS similarity
          FROM cand
          JOIN vec a ON a.vec_id = cand.query_id
          JOIN vec b ON b.vec_id = cand.neighbor_id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY 1, 2),
        approx AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY similarity DESC, neighbor_id) AS ra
          FROM cpairs QUALIFY ra <= 10),
        idcg AS (
          SELECT query_id, SUM(gain / log2(re + 1)) AS idcg
          FROM exact GROUP BY query_id),
        dcg AS (
          SELECT e.query_id, SUM(e.gain / log2(a.ra + 1)) AS dcg
          FROM exact e JOIN approx a USING (query_id, neighbor_id)
          GROUP BY e.query_id)
        SELECT i.query_id,
               ROUND(COALESCE(d.dcg, 0.0), 6) AS dcg,
               ROUND(i.idcg, 6) AS idcg,
               ROUND(COALESCE(d.dcg, 0.0) / i.idcg, 6) AS ndcg
        FROM idcg i LEFT JOIN dcg d USING (query_id)
        """
    ),
)


# T5/UL2 span corruption: md5-derived masking makes the training pairs
# byte-reproducible — the oracle re-derives input/target strings exactly
register(
    "q_corpus_span_corrupt",
    lambda s, d: textstats.span_corruption(
        _docs(s, d), mask_percent=15, span_len=3, seed=7
    ),
    _q_docs(
        """
        , blk AS (
          SELECT doc_id, g.j AS j,
                 array_to_string(list_slice(t, g.j * 3 + 1, g.j * 3 + 3), ' ') AS btext,
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
                                           || CAST(g.j AS VARCHAR) || '#7'), 1, 8))
                       AS BIGINT) % 100) < 15 AS masked
          FROM toks,
               LATERAL unnest(generate_series(0, CAST(ceiling(len(t) / 3.0) AS INT) - 1)) g(j)),
        kk AS (
          SELECT *,
                 COALESCE(SUM(CASE WHEN masked THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY j
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
          FROM blk),
        cor AS (
          SELECT doc_id,
                 string_agg(CASE WHEN masked THEN '<extra_id_' || k || '>'
                                 ELSE btext END, ' ' ORDER BY j) AS corrupted_text,
                 SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS n_masked
          FROM kk GROUP BY doc_id),
        tg AS (
          SELECT doc_id,
                 string_agg('<extra_id_' || k || '> ' || btext, ' ' ORDER BY j) AS t
          FROM kk WHERE masked GROUP BY doc_id)
        SELECT c.doc_id, c.corrupted_text,
               CASE WHEN t.t IS NULL THEN '<extra_id_0>'
                    ELSE t.t || ' <extra_id_' || c.n_masked || '>' END AS targets,
               CAST(c.n_masked AS BIGINT) AS n_masked
        FROM cor c LEFT JOIN tg t USING (doc_id)
        """
    ),
)


# contrastive training pairs: positive = exact rank-1 neighbor, negatives =
# top-3 of the [0.05, 0.35) hard-negative annulus (DPR/SimCSE recipe)
register(
    "q_emb_contrastive",
    lambda s, d: simsearch.contrastive_pairs(
        _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
        _ref(s, d).embeddings,
        n_negatives=3,
    ),
    _q_vec(
        f"""
        , pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS similarity
          FROM vec a, vec b, range(1, 65) t(i)
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        pos AS (
          SELECT query_id, neighbor_id, similarity, 'pos' AS label, 1 AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY similarity DESC, neighbor_id) AS rn
            FROM pairs) WHERE rn = 1),
        neg AS (
          SELECT query_id, neighbor_id, similarity, 'neg' AS label, CAST(rn AS INT) AS rank
          FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY similarity DESC, neighbor_id) AS rn
            FROM pairs WHERE similarity >= 0.05 AND similarity < 0.35)
          WHERE rn <= 3)
        SELECT query_id, neighbor_id, similarity, label, CAST(rank AS INT) AS rank FROM pos
        UNION ALL
        SELECT query_id, neighbor_id, similarity, label, rank FROM neg
        """
    ),
)


# MinHash-LSH S-curve tuning table: p = 1 - (1 - s^r)^b over every
# factorization of the signature length — the math behind the module's
# band/row defaults, exposed as a query so parameter choices are auditable
register(
    "q_dedup_lsh_curve",
    lambda s, d: dedup.lsh_tuning_curve(s, num_hashes=32),
    """
    WITH f(b, r) AS (VALUES (32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32)),
    grid AS (SELECT CAST(g.i AS INT) AS i FROM range(1, 20) g(i))
    SELECT f.b, f.r, CAST(ROUND(i * 0.05, 2) AS DOUBLE) AS s,
           ROUND(1.0 - pow(1.0 - pow(ROUND(i * 0.05, 2), f.r), f.b), 6) AS p_detect
    FROM f, grid
    """,
)


# Multi-probe LSH (Lv et al. 2007): query-side probing of the one-bit-
# flip neighbor buckets — recall toward exact at a fixed table count,
# with the corpus-side index byte-identical to the single-probe one
register(
    "q_simsearch_lsh_multiprobe",
    lambda s, d: simsearch.topk_hyperplane_lsh_multiprobe(
        _ref(s, d).embeddings.filter(F.col("vec_id") < 10),
        _ref(s, d).embeddings,
        k=10,
        num_planes=4,
        num_tables=4,
        seed=123,
        dim=64,
    ),
    _q_vec(
        f"""
        , planes(tid, pid, pv) AS (VALUES {_PLANES_VALUES}),
        dots AS (
          SELECT v.vec_id, p.tid, p.pid, SUM(v.v[t.i] * p.pv[t.i]) AS d
          FROM vec v, planes p, range(1, 65) t(i)
          GROUP BY 1, 2, 3),
        buckets AS (
          SELECT vec_id, tid,
                 CAST(SUM(CASE WHEN d >= 0 THEN (1 << pid) ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id, tid),
        probes AS (
          SELECT vec_id, tid,
                 CAST(xor(bucket, CASE WHEN g.p = 0 THEN 0
                                       ELSE (1 << (g.p - 1)) END) AS BIGINT) AS bucket
          FROM buckets, range(0, 5) g(p)
          WHERE vec_id < 10),
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM probes q
          JOIN buckets c ON q.tid = c.tid AND q.bucket = c.bucket AND q.vec_id <> c.vec_id),
        pairs AS (
          SELECT cand.query_id, cand.neighbor_id, {_COS} AS similarity
          FROM cand
          JOIN vec a ON a.vec_id = cand.query_id
          JOIN vec b ON b.vec_id = cand.neighbor_id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, similarity FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY similarity DESC, neighbor_id) AS rn
          FROM pairs) WHERE rn <= 10
        """
    ),
)


register(
    "q_corpus_dup_profile",
    lambda s, d: dedup.duplication_profile(_docs(s, d)),
    _q_docs(
        """
        , pd AS (
          SELECT d.doc_id, d.source,
                 md5(array_to_string(list_sort(list_distinct(string_split(n.norm, ' '))), ' '))
                   AS fp,
                 CAST(len(string_split(n.norm, ' ')) AS BIGINT) AS nt
          FROM documents d JOIN norm n USING (doc_id)),
        g AS (SELECT fp, MIN(doc_id) AS keep, COUNT(*) AS gs FROM pd GROUP BY fp),
        tg AS (
          SELECT pd.*, (g.gs > 1 AND pd.doc_id <> g.keep) AS dup
          FROM pd JOIN g USING (fp))
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
               ROUND(SUM(CASE WHEN dup THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                 AS dup_doc_fraction,
               CAST(SUM(nt) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN dup THEN nt ELSE 0 END) AS BIGINT) AS n_dup_tokens,
               ROUND(SUM(CASE WHEN dup THEN nt ELSE 0 END) * 1.0 / SUM(nt), 6)
                 AS dup_token_fraction
        FROM tg GROUP BY source
        """
    ),
)


register(
    "q_text_length_quantiles",
    lambda s, d: textstats.length_quantiles_by_source(_docs(s, d)),
    _q_docs(
        """
        , tc AS (
          SELECT d.source, CAST(len(string_split(n.norm, ' ')) AS BIGINT) AS n_tokens
          FROM documents d JOIN norm n USING (doc_id)),
        hist AS (SELECT source, n_tokens, COUNT(*) AS c FROM tc GROUP BY 1, 2),
        tot AS (SELECT source, COUNT(*) AS n FROM tc GROUP BY source),
        cum AS (
          SELECT h.source, h.n_tokens, t.n,
                 SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.n_tokens) AS cumc
          FROM hist h JOIN tot t USING (source)),
        q(num, den) AS (VALUES (1, 2), (9, 10))
        SELECT source, ROUND(num * 1.0 / den, 6) AS q,
               MIN(n_tokens) AS n_tokens_at_q
        FROM cum, q
        WHERE cumc >= (num * n + den - 1) // den
        GROUP BY source, num, den
        """
    ),
)


def _minhash_calibration_q(s: SparkSession, d: str) -> DataFrame:
    """Estimator-calibration curve for the MinHash pipeline: every LSH
    candidate pair's (estimated, exact) Jaccard rolled up by exact-
    Jaccard decile — the audit that justifies trusting est-Jaccard gates
    (like the near-dup ingest's verify step) at a given signature
    length. Thresholds at 0 so the whole candidate population is
    scored."""
    v = dedup.neardup_lsh_verified(
        _docs(s, d), num_hashes=32, bands=8, shingle_n=3, threshold=0.0
    )
    b = F.least(F.floor(F.lit(10.0) * F.col("jaccard")), F.lit(9)).cast("long")
    return (
        v.select(b.alias("j_bucket"), "est_jaccard", "jaccard")
        .groupBy("j_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg("est_jaccard"), 6).alias("mean_est"),
            F.round(F.avg("jaccard"), 6).alias("mean_exact"),
            F.round(F.avg(F.abs(F.col("est_jaccard") - F.col("jaccard"))), 6).alias(
                "mean_abs_err"
            ),
        )
    )


register(
    "q_dedup_minhash_calibration",
    _minhash_calibration_q,
    _q_docs(
        f"""
        , coef(seed, a, b) AS (VALUES {{_MINHASH_COEF_VALUES}}),
        base AS (
          SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
          FROM sh),
        sig AS (
          SELECT doc_id, seed, MIN((a * h + b) % {{_MINHASH_PRIME}}) AS mh
          FROM base CROSS JOIN coef
          GROUP BY doc_id, seed),
        bands AS (
          SELECT doc_id, seed // 4 AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
          FROM sig GROUP BY doc_id, seed // 4),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        est AS (
          SELECT c.doc_a, c.doc_b,
                 ROUND(AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS est_jaccard
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.doc_a
          JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
          GROUP BY 1, 2),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, COUNT(*) AS i
          FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
          GROUP BY 1, 2),
        verified AS (
          SELECT doc_a, doc_b,
                 ROUND(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b),
        joined AS (
          SELECT LEAST(CAST(floor(10.0 * v.jaccard) AS BIGINT), 9) AS j_bucket,
                 e.est_jaccard, v.jaccard
          FROM verified v JOIN est e ON e.doc_a = v.doc_a AND e.doc_b = v.doc_b)
        SELECT j_bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(AVG(est_jaccard), 6) AS mean_est,
               ROUND(AVG(jaccard), 6) AS mean_exact,
               ROUND(AVG(ABS(est_jaccard - jaccard)), 6) AS mean_abs_err
        FROM joined GROUP BY j_bucket
        """
    ).replace("{_MINHASH_COEF_VALUES}", _MINHASH_COEF_VALUES).replace(
        "{_MINHASH_PRIME}", str(dedup.MINHASH_PRIME)
    ),
)


register(
    "q_events_decay",
    lambda s, d: events.decayed_activity(_ref(s, d).events, half_life_hours=24.0),
    """
    WITH ref AS (SELECT MAX(epoch_us(ts)) AS r FROM events)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value * pow(0.5, (ref.r - epoch_us(ts)) / 86400000000.0)), 6)
             AS decay_score
    FROM events, ref
    GROUP BY user_id
    """,
)


# Weighted (bag) Jaccard near-dup: distinguishes repetition MASS where
# set-resemblance can't — uncapped here (3-gram df is tiny on this corpus;
# the cap is the production default for web-scale token skew)
register(
    "q_dedup_weighted_jaccard",
    lambda s, d: dedup.weighted_jaccard_pairs(
        _docs(s, d), shingle_n=3, threshold=0.3, max_docs_per_token=None
    ),
    _q_docs(
        """
        , g AS (
          SELECT doc_id,
                 unnest([array_to_string(list_slice(t, i, i + 2), ' ')
                         for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS gram
          FROM toks),
        tw AS (SELECT doc_id, gram, COUNT(*) AS w FROM g GROUP BY 1, 2),
        tot AS (SELECT doc_id, SUM(w) AS wt FROM tw GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 SUM(LEAST(a.w, b.w)) AS imin
          FROM tw a JOIN tw b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, wjaccard FROM (
          SELECT doc_a, doc_b,
                 ROUND(CAST(imin AS DOUBLE) / (ta.wt + tb.wt - imin), 6) AS wjaccard
          FROM inter
          JOIN tot ta ON ta.doc_id = doc_a
          JOIN tot tb ON tb.doc_id = doc_b)
        WHERE wjaccard >= 0.3
        """
    ),
)


# ICWS weighted MinHash: the signature table itself is md5-derived and
# value-hash checkable (argmin runs in the log domain — no exp anywhere)
_ICWS_U = (  # slice k (0-based) of digest `which` as a uniform in (0, 1]
    "(CAST(('0x' || substr(md5(gram || '#' || CAST(7000 + seed * 2 + {which} AS VARCHAR)), "
    "{start}, 8)) AS BIGINT) + 1) / 4294967296.0"
)
_ICWS_SIG_CTES = f"""
    , g AS (
      SELECT doc_id,
             unnest([array_to_string(list_slice(t, i, i + 2), ' ')
                     for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS gram
      FROM toks),
    tw AS (SELECT doc_id, gram, COUNT(*) AS w FROM g GROUP BY 1, 2),
    x AS (SELECT doc_id, gram, w, CAST(s.seed AS INT) AS seed
          FROM tw, range(0, 8) s(seed)),
    uu AS (
      SELECT doc_id, gram, w, seed,
             {_ICWS_U.format(which=0, start=1)} AS u1,
             {_ICWS_U.format(which=0, start=9)} AS u2,
             {_ICWS_U.format(which=0, start=17)} AS u3,
             {_ICWS_U.format(which=0, start=25)} AS u4,
             {_ICWS_U.format(which=1, start=1)} AS u5
      FROM x),
    sc AS (
      SELECT doc_id, seed, gram, w,
             -(ln(u1) + ln(u2)) AS r, -(ln(u3) + ln(u4)) AS c,
             (u5 * 4294967296.0 - 1.0) / 4294967296.0 AS beta
      FROM uu),
    tc2 AS (
      SELECT doc_id, seed, gram,
             floor(ln(CAST(w AS DOUBLE)) / r + beta) AS t,
             ln(c) - r * (floor(ln(CAST(w AS DOUBLE)) / r + beta) - beta) - r AS lna
      FROM sc),
    sig AS (
      SELECT doc_id, seed, gram, CAST(t AS BIGINT) AS t FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, seed
                                     ORDER BY lna, gram, t) AS rn
        FROM tc2) WHERE rn = 1)
""".strip()

register(
    "q_dedup_icws_sigs",
    lambda s, d: dedup.icws_signatures(_docs(s, d), num_hashes=8, shingle_n=3),
    _q_docs(_ICWS_SIG_CTES + "\n    SELECT doc_id, seed, gram, t FROM sig"),
)

register(
    "q_dedup_icws_pairs",
    lambda s, d: dedup.icws_est_pairs(
        _docs(s, d), num_hashes=8, shingle_n=3, threshold=0.3
    ),
    _q_docs(
        _ICWS_SIG_CTES
        + """,
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.seed = b.seed AND a.gram = b.gram AND a.t = b.t
       AND a.doc_id < b.doc_id),
    est AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(AVG(CASE WHEN sa.gram = sb.gram AND sa.t = sb.t
                            THEN 1.0 ELSE 0.0 END), 6) AS est_wjaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, est_wjaccard FROM est WHERE est_wjaccard >= 0.3
    """
    ),
)


register(
    "q_text_lexical",
    lambda s, d: textstats.lexical_diversity(_docs(s, d)),
    _q_docs(
        """
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               ROUND(COUNT(*) * 1.0 / SUM(c), 6) AS ttr,
               ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                 AS hapax_fraction
        FROM tc GROUP BY doc_id
        """
    ),
)

# Zipf profile of the corpus vocabulary: least-squares ln(count) ~ ln(rank)
# over the tokenizer's own two-level ranks — natural text ~ -1
register(
    "q_corpus_zipf",
    lambda s, d: textstats.zipf_fit(_docs(s, d), top_k=1000),
    _q_docs(
        """
        , tokd AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        counts AS (SELECT token, COUNT(*) AS count FROM tokd GROUP BY token),
        vocab AS (
          SELECT token, count,
                 ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1 AS token_id
          FROM counts QUALIFY token_id < 1000),
        pts AS (SELECT ln(CAST(token_id AS DOUBLE) + 1) AS x,
                       ln(CAST(count AS DOUBLE)) AS y
                FROM vocab),
        a AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM pts)
        SELECT CAST(n AS BIGINT) AS n_tokens_fit,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
                 AS intercept
        FROM a
        """
    ),
)


# --- lakehouse layout optimization (operators/layout.py) --------------------
#
# Z-order (Morton) clustering audit over the events table: x = event time
# in epoch micros, y = user_id — the classic "time range AND user range"
# two-dimensional scan problem. Both queries are pure integer arithmetic
# end to end (bucketize -> interleave -> two-level rank -> zone maps), so
# they value-hash across engines with no float hazards.

from .operators import layout  # noqa: E402

_LAYOUT_BITS = 8
_LAYOUT_NB = 1 << _LAYOUT_BITS
_LAYOUT_RPB = 128


def _morton_sql(xb: str, yb: str, bits: int) -> str:
    """The same interleave expression morton_key() builds column-wise,
    generated as SQL text — disjoint bit positions, so + is bitwise OR."""
    return " + ".join(
        f"((({xb} >> {i}) & 1) << {2 * i + 1}) + ((({yb} >> {i}) & 1) << {2 * i})"
        for i in range(bits)
    )


_LAYOUT_CTES = f"""
base AS (
  SELECT epoch_us(ts) AS x, user_id AS y, event_id AS rid
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
bnd AS (SELECT MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy
        FROM base),
bk AS (
  -- span-branched exactly like zorder_key (round-8 ADVICE: the oracle
  -- kept the unconditional multiply-first formula after the engine grew
  -- the wide-span divide-first fallback; the two must not drift): exact
  -- multiply-then-divide while span <= 2^(63-bits), else divide-first
  SELECT x, y, rid,
         (CASE WHEN (maxx - minx + 1) <= {1 << (63 - _LAYOUT_BITS)}
               THEN (x - minx) * {_LAYOUT_NB} // (maxx - minx + 1)
               ELSE (x - minx) // (((maxx - minx + 1) + {_LAYOUT_NB - 1}) // {_LAYOUT_NB})
          END) AS xb,
         (CASE WHEN (maxy - miny + 1) <= {1 << (63 - _LAYOUT_BITS)}
               THEN (y - miny) * {_LAYOUT_NB} // (maxy - miny + 1)
               ELSE (y - miny) // (((maxy - miny + 1) + {_LAYOUT_NB - 1}) // {_LAYOUT_NB})
          END) AS yb
  FROM base, bnd),
cells AS (
  SELECT x, y, rid, xb, yb,
         xb * {_LAYOUT_NB} + yb AS cell_linear,
         {_morton_sql("xb", "yb", _LAYOUT_BITS)} AS cell_z
  FROM bk),
lay AS (
  SELECT 'linear' AS layout, cell_linear AS cell, x, y, rid, xb, yb FROM cells
  UNION ALL
  SELECT 'zorder' AS layout, cell_z AS cell, x, y, rid, xb, yb FROM cells),
blocks AS (
  SELECT layout, xb, yb,
         (ROW_NUMBER() OVER (PARTITION BY layout ORDER BY cell, x, y, rid) - 1)
           // {_LAYOUT_RPB} AS block_id
  FROM lay),
zm AS (
  SELECT layout, block_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(xb) AS min_xb, MAX(xb) AS max_xb,
         MIN(yb) AS min_yb, MAX(yb) AS max_yb
  FROM blocks GROUP BY layout, block_id)
""".strip()

register(
    "q_layout_zonemaps",
    lambda s, d: layout.layout_zonemaps(
        _ref(s, d).events.select(
            F.unix_micros("ts").alias("ts_us"), "user_id", "event_id"
        ),
        "ts_us",
        "user_id",
        "event_id",
        bits=_LAYOUT_BITS,
        rows_per_block=_LAYOUT_RPB,
    ),
    f"""
    WITH {_LAYOUT_CTES}
    SELECT layout, block_id, n_rows, min_xb, max_xb, min_yb, max_yb FROM zm
    """,
)

register(
    "q_layout_pruning",
    lambda s, d: layout.layout_pruning(
        _ref(s, d).events.select(
            F.unix_micros("ts").alias("ts_us"), "user_id", "event_id"
        ),
        "ts_us",
        "user_id",
        "event_id",
        bits=_LAYOUT_BITS,
        rows_per_block=_LAYOUT_RPB,
        x_lo=64,
        x_hi=127,
        y_lo=64,
        y_hi=127,
    ),
    f"""
    WITH {_LAYOUT_CTES.replace(
        "MIN(yb) AS min_yb, MAX(yb) AS max_yb",
        "MIN(yb) AS min_yb, MAX(yb) AS max_yb, "
        "CAST(SUM(CASE WHEN xb BETWEEN 64 AND 127 AND yb BETWEEN 64 AND 127 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_matched",
    )},
    sc AS (
      SELECT *, (min_xb <= 127 AND max_xb >= 64 AND min_yb <= 127 AND max_yb >= 64)
                AS scanned
      FROM zm)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
             AS blocks_scanned,
           CAST(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(SUM(n_matched) AS BIGINT) AS rows_matched,
           ROUND(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) * 1.0 / SUM(n_rows), 6)
             AS scan_fraction,
           ROUND(AVG(max_xb - min_xb + 1), 6) AS avg_x_span,
           ROUND(AVG(max_yb - min_yb + 1), 6) AS avg_y_span
    FROM sc GROUP BY layout
    """,
)


# Readability (Flesch / Flesch-Kincaid) over the punctuation-bearing C4
# page fixture — the raw synthetic corpus has no sentence terminals, so
# every doc would be exactly one sentence (degenerate, same reason as
# q_text_sentences). Pure integer counts + two double ratios.
register(
    "q_text_readability",
    lambda s, d: textstats.readability(_c4_pages(s, d)),
    r"""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN text || '.'
               WHEN 1 THEN text || '?'
               WHEN 2 THEN array_to_string(list_slice(
                             string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
                             1, 3), ' ') || ' done.'
               ELSE text || ' javascript.'
             END AS text
      FROM documents),
    pg AS (
      SELECT doc_id // 8 AS sd_id,
             string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS page
      FROM m GROUP BY doc_id // 8),
    pages AS (
      SELECT sd_id AS doc_id,
             page
             || CASE WHEN sd_id % 7 = 0
                     THEN chr(10) || chr(10) || 'lorem ipsum dolor sit.'
                     ELSE '' END
             || CASE WHEN sd_id % 5 = 0
                     THEN chr(10) || chr(10) || 'this page has a { brace }.'
                     ELSE '' END AS text
      FROM pg),
    w AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
               x -> x <> '')) AS word
      FROM pages),
    ws AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(greatest(len(regexp_extract_all(word, '[aeiouy]+')), 1))
                  AS BIGINT) AS n_syllables
      FROM w GROUP BY doc_id),
    sc AS (
      SELECT doc_id,
             CAST(len(list_filter(
               list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                              x -> trim(x)),
               x -> x <> '')) AS BIGINT) AS n_sentences
      FROM pages)
    SELECT ws.doc_id, n_words, n_sentences, n_syllables,
           ROUND(206.835 - 1.015 * (n_words / n_sentences)
                         - 84.6 * (n_syllables / n_words), 6) AS flesch,
           ROUND(0.39 * (n_words / n_sentences)
                 + 11.8 * (n_syllables / n_words) - 15.59, 6) AS fk_grade
    FROM ws JOIN sc ON ws.doc_id = sc.doc_id
    WHERE n_words > 0 AND n_sentences > 0
    """,
)


# Session path mining: funnel DISCOVERY (q_events_funnel measures a given
# path; this finds the paths worth measuring). Same sessionization CTE as
# q_events_sessionize, then per-session LEAD trigrams, global top-20.
register(
    "q_events_paths",
    # gap=240min: the synthetic stream averages ~10h between a user's
    # events, so the 30-min serving-session gap would make nearly every
    # session a single event (no paths to mine)
    lambda s, d: events.session_paths(
        _ref(s, d).events, gap_minutes=240, n=3, top_k=20
    ),
    """
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 14400000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sid AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged),
    steps AS (
      SELECT event_type AS t0,
             LEAD(event_type, 1) OVER w2 AS t1,
             LEAD(event_type, 2) OVER w2 AS t2
      FROM sid
      WINDOW w2 AS (PARTITION BY user_id, session_seq ORDER BY ts_us, event_id))
    SELECT t0 || '>' || t1 || '>' || t2 AS path,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM steps WHERE t2 IS NOT NULL
    GROUP BY 1 ORDER BY n_occurrences DESC, path LIMIT 20
    """,
)


# Min-K% Prob contamination/membership audit (Shi et al. 2023) over the
# CCNet-proxy char-bigram LM — the probability-based half of corpus
# decontamination, next to q_corpus_decontaminate's exact-gram half.
register(
    "q_text_min_k_prob",
    lambda s, d: textstats.min_k_prob_scores(_docs(s, d), k_pct=20),
    _q_docs(
        """
        , base AS (SELECT doc_id, norm FROM norm WHERE length(norm) >= 2),
        grams AS (
          SELECT doc_id, unnest([substr(norm, i, 2) for i in range(1, length(norm))]) AS bigram
          FROM base),
        big AS (SELECT bigram, COUNT(*) AS cnt FROM grams GROUP BY bigram),
        pre AS (SELECT substr(bigram, 1, 1) AS c1, SUM(cnt) AS tot FROM big GROUP BY 1),
        model AS (
          SELECT bigram, log2(CAST(cnt AS DOUBLE) / tot) AS lp
          FROM big JOIN pre ON substr(big.bigram, 1, 1) = pre.c1),
        rk AS (
          SELECT doc_id, lp,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY lp, bigram) AS r,
                 COUNT(*) OVER (PARTITION BY doc_id) AS n
          FROM grams JOIN model USING (bigram))
        SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_bigrams,
               CAST(COUNT(*) AS BIGINT) AS n_lowest,
               ROUND(AVG(lp), 6) AS min_k_score
        FROM rk WHERE r <= (n * 20 + 99) // 100
        GROUP BY doc_id
        """
    ),
)


# Embedding isotropy diagnostic: mean pairwise cosine WITHOUT forming
# pairs (||Σu||² − n identity) — the pre-flight check for every cosine
# cutoff in the suite (Ethayarajh 2019; Mu & Viswanath 2018).
register(
    "q_emb_isotropy",
    lambda s, d: simsearch.isotropy_report(_ref(s, d).embeddings),
    _q_vec(
        """
        , nrm AS (
          SELECT vec_id, SQRT(SUM(v[t.i] * v[t.i])) AS nv
          FROM vec, range(1, 65) t(i) GROUP BY vec_id),
        kept AS (SELECT vec_id, nv FROM nrm WHERE nv > 0),
        u AS (
          SELECT t.i AS i, v[t.i] / nv AS x
          FROM vec JOIN kept USING (vec_id), range(1, 65) t(i)),
        dimsum AS (SELECT i, SUM(x) AS s FROM u GROUP BY i),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
                 ROUND(AVG(nv), 6) AS mean_norm
          FROM kept),
        s2 AS (SELECT SUM(s * s) AS ss, CAST(COUNT(*) AS BIGINT) AS dim FROM dimsum)
        SELECT n_vectors, dim, mean_norm,
               ROUND((ss - n_vectors) / (n_vectors * (n_vectors - 1.0)), 6)
                 AS mean_pairwise_cosine
        FROM stats, s2
        """
    ),
)


# Pairwise source similarity: Jensen-Shannon divergence matrix between
# per-source unigram distributions — the measurement feeding mixture
# design (q_corpus_mix / q_corpus_mix_unimax) and the pairwise twin of
# q_ingest_drift's one-vs-baseline KL.
register(
    "q_text_source_js",
    lambda s, d: textstats.source_js_divergence(_docs(s, d)),
    _q_docs(
        """
        , tokd AS (
          SELECT d.source, unnest(t.t) AS token
          FROM toks t JOIN documents d USING (doc_id)),
        counts AS (SELECT source, token, COUNT(*) AS c FROM tokd GROUP BY 1, 2),
        totals AS (SELECT source, SUM(c) AS tot FROM counts GROUP BY source),
        dist AS (
          SELECT counts.source, token, CAST(c AS DOUBLE) / tot AS p
          FROM counts JOIN totals ON counts.source = totals.source),
        common AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 a.p AS pa, b.p AS pb
          FROM dist a JOIN dist b USING (token)
          WHERE a.source < b.source)
        SELECT source_a, source_b,
               CAST(COUNT(*) AS BIGINT) AS n_common_tokens,
               ROUND(SUM(pa / 2 * log2(2 * pa / (pa + pb))
                         + pb / 2 * log2(2 * pb / (pa + pb)))
                     + (1.0 - SUM(pa)) / 2 + (1.0 - SUM(pb)) / 2, 6)
                 AS js_divergence
        FROM common GROUP BY source_a, source_b
        """
    ),
)


# Signal-evaluation faces (operators/evaluate.py): reliability diagram
# and exact midrank ROC-AUC of the deterministic stopword-ratio quality
# signal against the lang=='en' target domain — the validate-before-
# threshold step every filter signal owes (the learned classifier's
# scores are float-iteration-dependent, so the EVALUATION operators are
# attested on the rule-based signal both engines derive bit-identically).

from .operators import evaluate  # noqa: E402


def _quality_signal_labeled(s: SparkSession, d: str) -> DataFrame:
    docs = _docs(s, d)
    return textstats.quality_scores(docs).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("label")), "doc_id"
    )


_EVAL_LAB_CTES = f"""
tokq AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
aggq AS (
  SELECT doc_id,
         ROUND(AVG(CASE WHEN token IN ({_SW_EN}) THEN 1.0 ELSE 0.0 END), 6) AS s
  FROM tokq GROUP BY doc_id),
lab AS (
  SELECT a.doc_id, s, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM aggq a JOIN documents d USING (doc_id))
""".strip()

register(
    "q_eval_calibration",
    lambda s, d: evaluate.calibration_table(
        _quality_signal_labeled(s, d), score_col="stopword_ratio", n_bins=10
    ),
    _q_docs(
        f"""
        , {_EVAL_LAB_CTES}
        SELECT LEAST(CAST(FLOOR(s * 10) AS BIGINT), 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               ROUND(AVG(s), 6) AS mean_score,
               ROUND(AVG(CAST(y AS DOUBLE)), 6) AS pos_rate
        FROM lab GROUP BY 1
        """
    ),
)

register(
    "q_eval_auc",
    lambda s, d: evaluate.binary_auc(
        _quality_signal_labeled(s, d), score_col="stopword_ratio"
    ),
    _q_docs(
        f"""
        , {_EVAL_LAB_CTES},
        hist AS (SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM lab GROUP BY s),
        rk AS (
          SELECT s, pos, neg,
                 COALESCE(SUM(neg) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING), 0) AS cumneg
          FROM hist)
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
               -- degenerate single-class guard mirrors the engine's CASE
               -- (round-7 ADVICE): NULL, never a div-by-zero divergence
               CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0
                    THEN ROUND(SUM(pos * (2 * cumneg + neg))
                               / (2.0 * SUM(pos) * SUM(neg)), 6)
                    ELSE NULL END AS auc
        FROM rk
        """
    ),
)


# Per-file zone-map stats as a maintained ingest sidecar (the Delta
# add-file-stats / Iceberg manifest-bounds analog): daily files over the
# event stream, stats merged from three disjoint sub-batches by the
# (MIN, MAX, SUM) monoid, then the reader's skip decision for one week
# x one user range — planning from stats alone, no data-file reads.
_ZM_X_LO = 1_704_672_000_000_000  # 2024-01-08T00:00:00Z, epoch micros
_ZM_X_HI = 1_705_276_799_999_999  # 2024-01-14T23:59:59.999999Z
_ZM_Y_LO, _ZM_Y_HI = 0, 49


def _ingest_zonemaps_q(s: SparkSession, d: str) -> DataFrame:
    ev = _ref(s, d).events.select(
        F.unix_micros("ts").alias("ts_us"), "user_id", "event_id"
    )
    deltas = None
    for i in range(3):
        delta = layout.zonemap_delta_table(
            ev.filter(F.col("event_id") % 3 == i),
            "ts_us",
            "user_id",
            F.expr("ts_us DIV 86400000000"),
        )
        deltas = delta if deltas is None else deltas.unionByName(delta)
    stats = layout.consolidate_zonemaps(deltas)
    return layout.zonemap_scan_decisions(stats, _ZM_X_LO, _ZM_X_HI, _ZM_Y_LO, _ZM_Y_HI)


register(
    "q_ingest_zonemaps",
    _ingest_zonemaps_q,
    f"""
    WITH base AS (
      SELECT epoch_us(ts) AS x, user_id AS y,
             epoch_us(ts) // 86400000000 AS f
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    st AS (
      SELECT f AS file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y
      FROM base GROUP BY f)
    SELECT file_id, n_rows, min_x, max_x, min_y, max_y,
           (min_x <= {_ZM_X_HI} AND max_x >= {_ZM_X_LO}
            AND min_y <= {_ZM_Y_HI} AND max_y >= {_ZM_Y_LO}) AS scanned
    FROM st
    """,
)


# Language-ID confusion matrix: the multiclass evaluation face — where
# each true language's documents land under the stopword-argmax guesser
# (diagonal = per-class recall; the 'und' column = coverage gaps).
register(
    "q_eval_confusion",
    lambda s, d: evaluate.confusion_matrix(
        textstats.language_id(s, _docs(s, d)).select(
            "doc_id", F.col("lang_guess").alias("pred")
        ),
        _docs(s, d).select("doc_id", F.col("lang").alias("label")),
    ),
    _q_docs(
        f"""
        , tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        sw(lang, word) AS (VALUES {_SW_VALUES}),
        hits AS (
          SELECT doc_id, lang, COUNT(*) AS h
          FROM tok JOIN sw ON tok.token = sw.word
          GROUP BY 1, 2),
        best AS (
          SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) AS rn
            FROM hits) WHERE rn = 1),
        pred AS (
          SELECT n.doc_id,
                 CASE WHEN CAST(length(n.norm) - length(regexp_replace(n.norm, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS DOUBLE)
                           / length(n.norm) > 0.3 THEN 'zh'
                      ELSE COALESCE(b.lang, 'und') END AS pred_label
          FROM norm n LEFT JOIN best b USING (doc_id)),
        cm AS (
          SELECT d.lang AS true_label, p.pred_label,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM pred p JOIN documents d USING (doc_id)
          GROUP BY 1, 2)
        SELECT true_label, pred_label, n,
               ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY true_label), 6)
                 AS share_of_true
        FROM cm
        """
    ),
)

# Small-file compaction planning from the zone-map sidecar alone: daily
# files under 500 rows greedily packed into ~1000-row bins (first-fit in
# file_id order) — the OPTIMIZE bin-packing step as a stats-only query.
register(
    "q_ingest_compaction",
    lambda s, d: layout.compaction_plan(
        layout.zonemap_delta_table(
            _ref(s, d).events.select(
                F.unix_micros("ts").alias("ts_us"), "user_id", "event_id"
            ),
            "ts_us",
            "user_id",
            F.expr("ts_us DIV 86400000000"),
        ),
        target_rows=1000,
        small_threshold=500,
    ),
    """
    WITH base AS (
      SELECT epoch_us(ts) AS x, user_id AS y,
             epoch_us(ts) // 86400000000 AS f
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    st AS (
      SELECT f AS file_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM base GROUP BY f),
    small AS (SELECT * FROM st WHERE n_rows < 500),
    cum AS (
      -- DuckDB SUM(BIGINT) widens to HUGEINT, which pandas renders as
      -- float64 — the driver's value-hash then sees 0.0 vs Spark's LONG 0
      -- (the r08 red row). Pin the cumsum back to BIGINT so bin_id stays
      -- integral end-to-end. Division semantics: c is a cumsum of COUNTs,
      -- provably >= 0, so DuckDB // (trunc on 1.0.0) and Spark DIV agree
      -- regardless of either engine's negative-operand convention.
      SELECT file_id, n_rows,
             CAST(COALESCE(SUM(n_rows) OVER (ORDER BY file_id ROWS BETWEEN
                      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
      FROM small)
    SELECT file_id, n_rows, CAST(c // 1000 AS BIGINT) AS bin_id FROM cum
    """,
)


# Timestamp-free compaction face (round-8 VERDICT item 1b): the same
# compaction_plan over file stats keyed on an all-integer expression
# (user_id DIV 7 — at sf0.01 that is 22 files, 20 under the 500-row
# threshold and 2 over, so the small-file filter genuinely branches).
# No ts column anywhere, so a driver-red here would isolate the binning
# arithmetic (cumsum window + DIV) from the events-ts decode seam, and a
# green co-attested with q_ingest_compaction pins the divergence class.
register(
    "q_ingest_compaction_ids",
    lambda s, d: layout.compaction_plan(
        layout.zonemap_delta_table(
            _ref(s, d).events.select("event_id", "user_id"),
            "event_id",
            "user_id",
            F.expr("user_id DIV 7"),
        ),
        target_rows=1000,
        small_threshold=500,
    ),
    """
    WITH base AS (
      -- user_id // 7 vs Spark's DIV: DuckDB 1.x '//' TRUNCATES toward
      -- zero for integer operands, matching Spark DIV — but '//' is
      -- FLOOR division in other engines (and for DOUBLE operands even in
      -- DuckDB), so the two diverge on negative operands. user_id is
      -- generated non-negative in every testdata generation (and NULLs
      -- are filtered here), where trunc == floor; if the oracle engine is
      -- ever upgraded or ids go signed, re-pin with the cumsum comment's
      -- discipline below (round-9 ADVICE).
      SELECT event_id, user_id, user_id // 7 AS f
      FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
    st AS (
      SELECT f AS file_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM base GROUP BY f),
    small AS (SELECT * FROM st WHERE n_rows < 500),
    cum AS (
      SELECT file_id, n_rows,
             CAST(COALESCE(SUM(n_rows) OVER (ORDER BY file_id ROWS BETWEEN
                      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
      FROM small)
    SELECT file_id, n_rows, CAST(c // 1000 AS BIGINT) AS bin_id FROM cum
    """,
)


# Matryoshka truncated-dimension recall curve (Kusupati et al. 2022):
# recall@k of prefix-dim cosine top-k vs the full-dim exact spine — how
# many dimensions the index needs before recall saturates. The full-dim
# row is the built-in sanity check (recall exactly 1.0).
_MRL_DIMS = (8, 16, 32, 64)
_MRL_K = 10


def _matryoshka_oracle(dims: tuple[int, ...], k: int) -> str:
    full = max(dims)
    ctes = []
    for d in dims:
        ctes.append(
            f"""pd{d} AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND(SUM(a.v[t.i] * b.v[t.i])
               / (SQRT(SUM(a.v[t.i] * a.v[t.i]))
                  * SQRT(SUM(b.v[t.i] * b.v[t.i]))), 6) AS s
  FROM vec a, vec b, range(1, {d + 1}) t(i)
  WHERE a.vec_id <> b.vec_id
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""tk{d} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY s DESC, neighbor_id) AS rn
    FROM pd{d}) WHERE rn <= {k})"""
        )
    sels = []
    for d in dims:
        sels.append(
            f"""SELECT {d} AS dim, CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(AVG(r), 6) AS mean_recall FROM (
  SELECT e.query_id,
         ROUND(CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS r
  FROM tk{full} e LEFT JOIN tk{d} a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id)"""
        )
    return _q_vec(", " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels))


register(
    "q_simsearch_matryoshka",
    lambda s, d: simsearch.matryoshka_recall(
        _ref(s, d).embeddings, dims=_MRL_DIMS, k=_MRL_K
    ),
    _matryoshka_oracle(_MRL_DIMS, _MRL_K),
)


# Quality-aware exact-dedup survivor selection: keep the highest
# stopword-ratio copy per duplicate group (ties by id) — the survivor
# policy real cleanup pipelines use when duplicate copies differ in
# extraction quality.
register(
    "q_dedup_keep_best",
    lambda s, d: dedup.dedup_keep_best(
        _docs(s, d),
        textstats.quality_scores(_docs(s, d)).select("doc_id", "stopword_ratio"),
        score_col="stopword_ratio",
    ),
    _q_docs(
        f"""
        , tokb AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        q AS (
          SELECT doc_id,
                 ROUND(AVG(CASE WHEN token IN ({_SW_EN}) THEN 1.0 ELSE 0.0 END), 6) AS s
          FROM tokb GROUP BY doc_id),
        fp AS (
          SELECT d.doc_id, md5(d.text) AS fingerprint, q.s
          FROM documents d LEFT JOIN q USING (doc_id)),
        sizes AS (SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_dups
                  FROM fp GROUP BY fingerprint),
        best AS (
          SELECT doc_id, fingerprint, s FROM (
            SELECT doc_id, fingerprint, s,
                   ROW_NUMBER() OVER (PARTITION BY fingerprint
                                      ORDER BY s DESC NULLS LAST, doc_id) AS rn
            FROM fp) WHERE rn = 1)
        SELECT b.doc_id AS keep_id, sizes.n_dups, b.s AS keep_score, b.fingerprint
        FROM best b JOIN sizes USING (fingerprint)
        """
    ),
)

# k-anonymity audit (Sweeney 2002) of the users table's quasi-identifier
# pair (location, age) — the column-combination re-identification risk
# the per-value PII scrubber cannot see.
from .operators import diagnostics  # noqa: E402

register(
    "q_privacy_kanon",
    lambda s, d: diagnostics.k_anonymity_report(
        _ref(s, d).users.select("location", "age"), ["location", "age"], k=5
    ),
    _q(
        """
        , g AS (SELECT location, age, COUNT(*) AS n FROM users GROUP BY 1, 2)
        SELECT 5 AS k,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
               CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows,
               ROUND(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 1.0 / SUM(n), 6)
                 AS risky_fraction
        FROM g
        """
    ),
)


# Sharded-export manifest: deterministic md5 shard assignment + the
# order-free per-shard integrity row (XOR of 60-bit content hashes) —
# the commit a trainer-facing export writes next to its shards. The
# write path (export_jsonl_shards) is pytest-pinned: read-back manifest
# equals this query.
register(
    "q_corpus_shards",
    lambda s, d: etl.shard_manifest(_docs(s, d), n_shards=8),
    _q_docs(
        """
        , shd AS (
          SELECT d.doc_id,
                 CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#1453'), 1, 8))
                      AS BIGINT) % 8 AS shard_id,
                 CAST(('0x' || substr(md5(d.text), 1, 15)) AS BIGINT) AS h,
                 CAST(len(t.t) AS BIGINT) AS nt
          FROM documents d JOIN toks t USING (doc_id))
        SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS n_tokens,
               CAST(bit_xor(h) AS BIGINT) AS content_xor
        FROM shd GROUP BY shard_id
        """
    ),
)


# Held-out link prediction (Liben-Nowell & Kleinberg 2003): Adamic-Adar
# on the even-md5 half of the items, labels = co-interaction on the odd
# half, scored by the exact midrank AUC — the graph-ML evaluation face.
register(
    "q_graph_linkpred_auc",
    lambda s, d: corating.linkpred_auc(_ref(s, d).ratings),
    _q(
        """
        , pos AS (
          SELECT DISTINCT user_id, isbn,
                 CAST(('0x' || substr(md5(isbn), 1, 8)) AS BIGINT) % 2 AS half
          FROM ratings WHERE rating >= 6),
        train AS (SELECT user_id, isbn FROM pos WHERE half = 0),
        test AS (SELECT user_id, isbn FROM pos WHERE half = 1),
        ideg AS (SELECT isbn, COUNT(*) AS dg FROM train GROUP BY isbn
                 HAVING COUNT(*) >= 2),
        cand AS (
          SELECT a.user_id AS u1, b.user_id AS u2,
                 ROUND(SUM(1.0 / ln(d.dg)), 6) AS s
          FROM train a JOIN ideg d USING (isbn) JOIN train b USING (isbn)
          WHERE a.user_id < b.user_id
          GROUP BY a.user_id, b.user_id),
        tp AS (
          SELECT DISTINCT x.user_id AS u1, y.user_id AS u2
          FROM test x JOIN test y USING (isbn)
          WHERE x.user_id < y.user_id),
        lab AS (
          SELECT c.s,
                 CASE WHEN tp.u1 IS NOT NULL THEN 1 ELSE 0 END AS y
          FROM cand c LEFT JOIN tp ON tp.u1 = c.u1 AND tp.u2 = c.u2),
        hist AS (SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM lab GROUP BY s),
        rk AS (
          SELECT s, pos, neg,
                 COALESCE(SUM(neg) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING), 0) AS cumneg
          FROM hist)
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
               -- degenerate single-class guard mirrors the engine's CASE
               -- (round-7 ADVICE): NULL, never a div-by-zero divergence
               CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0
                    THEN ROUND(SUM(pos * (2 * cumneg + neg))
                               / (2.0 * SUM(pos) * SUM(neg)), 6)
                    ELSE NULL END AS auc
        FROM rk
        """
    ),
)


# The CAPPED link-prediction face (round-8 VERDICT item 4): the same
# held-out AA-vs-co-interaction experiment with max_raters_per_book=8
# applied to BOTH halves after the md5 item split — the per-item fanout
# bound the 100 TB path relies on, oracle-attested with the identical
# row_number() <= 8 pre-filter on each half.
register(
    "q_graph_linkpred_auc_capped",
    lambda s, d: corating.linkpred_auc(_ref(s, d).ratings, max_raters_per_book=8),
    _q(
        """
        , pos AS (
          SELECT DISTINCT user_id, isbn,
                 CAST(('0x' || substr(md5(isbn), 1, 8)) AS BIGINT) % 2 AS half
          FROM ratings WHERE rating >= 6),
        train AS (
          SELECT user_id, isbn FROM (
            SELECT user_id, isbn,
                   ROW_NUMBER() OVER (PARTITION BY isbn ORDER BY user_id) AS rn
            FROM pos WHERE half = 0) WHERE rn <= 8),
        test AS (
          SELECT user_id, isbn FROM (
            SELECT user_id, isbn,
                   ROW_NUMBER() OVER (PARTITION BY isbn ORDER BY user_id) AS rn
            FROM pos WHERE half = 1) WHERE rn <= 8),
        ideg AS (SELECT isbn, COUNT(*) AS dg FROM train GROUP BY isbn
                 HAVING COUNT(*) >= 2),
        cand AS (
          SELECT a.user_id AS u1, b.user_id AS u2,
                 ROUND(SUM(1.0 / ln(d.dg)), 6) AS s
          FROM train a JOIN ideg d USING (isbn) JOIN train b USING (isbn)
          WHERE a.user_id < b.user_id
          GROUP BY a.user_id, b.user_id),
        tp AS (
          SELECT DISTINCT x.user_id AS u1, y.user_id AS u2
          FROM test x JOIN test y USING (isbn)
          WHERE x.user_id < y.user_id),
        lab AS (
          SELECT c.s,
                 CASE WHEN tp.u1 IS NOT NULL THEN 1 ELSE 0 END AS y
          FROM cand c LEFT JOIN tp ON tp.u1 = c.u1 AND tp.u2 = c.u2),
        hist AS (SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM lab GROUP BY s),
        rk AS (
          SELECT s, pos, neg,
                 COALESCE(SUM(neg) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING), 0) AS cumneg
          FROM hist)
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
               CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0
                    THEN ROUND(SUM(pos * (2 * cumneg + neg))
                               / (2.0 * SUM(pos) * SUM(neg)), 6)
                    ELSE NULL END AS auc
        FROM rk
        """
    ),
)


# Temporal-holdout audit at day 24/30 of the stream: train/test sizes
# and the cold-start user fraction the offline eval must know before
# trusting sequential metrics.
_TSPLIT_CUTOFF_US = 1_706_140_800_000_000  # 2024-01-25T00:00:00Z

register(
    "q_events_time_split",
    lambda s, d: events.time_split_report(_ref(s, d).events, _TSPLIT_CUTOFF_US),
    f"""
    WITH base AS (
      SELECT user_id, (epoch_us(ts) < {_TSPLIT_CUTOFF_US}) AS is_train
      FROM events),
    counts AS (
      SELECT CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT) AS n_test
      FROM base),
    tru AS (SELECT DISTINCT user_id FROM base WHERE is_train),
    teu AS (SELECT DISTINCT user_id FROM base WHERE NOT is_train),
    cold AS (SELECT user_id FROM teu ANTI JOIN tru USING (user_id)),
    users AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tru) AS n_train_users,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM teu) AS n_test_users,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cold) AS n_cold_users)
    SELECT CAST({_TSPLIT_CUTOFF_US} AS BIGINT) AS cutoff_us,
           n_train, n_test, n_train_users, n_test_users, n_cold_users,
           CASE WHEN n_test_users > 0
                THEN ROUND(n_cold_users * 1.0 / n_test_users, 6)
                ELSE NULL END AS cold_fraction
    FROM counts, users
    """,
)


# Encoding-damage scoring: replacement chars, stray controls and the
# utf8-read-as-latin1 mojibake signature — the pre-tokenization cleanup
# filter (CCNet/C4 drop encoding-broken pages).
register(
    "q_text_mojibake",
    lambda s, d: textstats.encoding_noise_scores(_docs(s, d)),
    r"""
    WITH c AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_replacement,
             CAST(len(regexp_extract_all(text,
                  '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]')) AS BIGINT) AS n_control,
             CAST(len(regexp_extract_all(text, '[ÂÃ][ -ÿ]')) AS BIGINT)
               AS n_mojibake
      FROM documents)
    SELECT doc_id, n_chars, n_replacement, n_control, n_mojibake,
           ROUND((n_replacement + n_control + n_mojibake) * 1.0 / n_chars, 6)
             AS noise_ratio
    FROM c WHERE n_chars > 0
    """,
)

# Per-type inter-arrival histogram (log2-bucketed second gaps) — the
# burstiness fingerprint that calibrates the sessionize gap empirically.
register(
    "q_events_interarrival",
    lambda s, d: events.interarrival_profile(_ref(s, d).events),
    """
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000 AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
    b AS (
      SELECT event_type,
             CASE WHEN gap_s <= 0 THEN -1
                  ELSE CAST(length(bin(gap_s)) - 1 AS BIGINT) END AS gap_bucket
      FROM gaps WHERE gap_s IS NOT NULL)
    SELECT event_type, gap_bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY 1, 2
    """,
)


# Robust (median/MAD) outliers — the companion to q_events_anomaly for
# the data that breaks z-scores (outliers inflate mean/stddev; median
# and MAD have a 50% breakdown point).
register(
    "q_events_anomaly_mad",
    lambda s, d: events.value_anomalies_mad(_ref(s, d).events, k=3.5),
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1),
    wm AS (
      SELECT e.event_id, e.event_type, e.value, m.med
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
      FROM wm GROUP BY 1)
    SELECT event_id, wm.event_type, value,
           ROUND((value - med) / (1.4826 * mad), 6) AS robust_z
    FROM wm JOIN mad ON mad.event_type = wm.event_type
    WHERE mad > 0 AND abs((value - med) / (1.4826 * mad)) > 3.5
    """,
)

# Cross-source exact-duplication matrix: distinct shared fingerprints
# per source pair — the mixture-design companion to q_text_source_js
# (distributionally distinct sources can still share text verbatim).
register(
    "q_corpus_cross_source_dups",
    lambda s, d: dedup.cross_source_dup_matrix(_docs(s, d)),
    """
    WITH fp AS (
      SELECT DISTINCT source, md5(text) AS fingerprint FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_texts
    FROM fp a JOIN fp b USING (fingerprint)
    WHERE a.source < b.source
    GROUP BY 1, 2
    """,
)


# Rank-space quality-signal fusion: three incommensurable signals each
# mapped to exact empirical percentile rank (two-level histogram on the
# Spark side; the oracle can use cume_dist directly — same semantics,
# ties included), then averaged. The filter-side analog of RRF.
register(
    "q_text_quality_fused",
    lambda s, d: textstats.quality_percentile_fusion(_docs(s, d)),
    _q_docs(
        f"""
        , tokf AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        swq AS (
          SELECT doc_id,
                 ROUND(AVG(CASE WHEN token IN ({_SW_EN}) THEN 1.0 ELSE 0.0 END), 6) AS sw
          FROM tokf GROUP BY doc_id),
        baseq AS (SELECT doc_id, norm FROM norm WHERE length(norm) >= 2),
        gramsq AS (
          SELECT doc_id, unnest([substr(norm, i, 2) for i in range(1, length(norm))]) AS bigram
          FROM baseq),
        bigq AS (SELECT bigram, COUNT(*) AS cnt FROM gramsq GROUP BY bigram),
        preq AS (SELECT substr(bigram, 1, 1) AS c1, SUM(cnt) AS tot FROM bigq GROUP BY 1),
        modelq AS (
          SELECT bigram, log2(CAST(cnt AS DOUBLE) / tot) AS lp
          FROM bigq JOIN preq ON substr(bigq.bigram, 1, 1) = preq.c1),
        lmq AS (
          SELECT doc_id, ROUND(AVG(lp), 6) AS lm
          FROM gramsq JOIN modelq USING (bigram) GROUP BY doc_id),
        tcq AS (SELECT doc_id, token, COUNT(*) AS c FROM tokf GROUP BY 1, 2),
        lexq AS (
          SELECT doc_id, ROUND(COUNT(*) * 1.0 / SUM(c), 6) AS lex
          FROM tcq GROUP BY doc_id),
        j AS (
          SELECT swq.doc_id, sw, lm, lex
          FROM swq JOIN lmq USING (doc_id) JOIN lexq USING (doc_id)),
        r AS (
          SELECT doc_id,
                 ROUND(cume_dist() OVER (ORDER BY sw), 6) AS pr_stopword,
                 ROUND(cume_dist() OVER (ORDER BY lm), 6) AS pr_lm,
                 ROUND(cume_dist() OVER (ORDER BY lex), 6) AS pr_lexical
          FROM j)
        SELECT doc_id, pr_stopword, pr_lm, pr_lexical,
               ROUND((pr_stopword + pr_lm + pr_lexical) / 3, 6) AS fused_score
        FROM r
        """
    ),
)


# BPR-style implicit-feedback training table (Rendle et al. 2009):
# positives + md5-deterministic uniform negatives — reproducible across
# runs/engines/cluster sizes, the export property a trainer needs.
register(
    "q_recsys_training_samples",
    lambda s, d: recommend.implicit_training_samples(_ref(s, d).ratings, k=4),
    _q(
        """
        , pos AS (SELECT DISTINCT user_id, isbn FROM ratings WHERE rating >= 6),
        items AS (
          SELECT isbn, ROW_NUMBER() OVER (ORDER BY isbn) - 1 AS idx
          FROM (SELECT DISTINCT isbn FROM pos)),
        nn AS (SELECT COUNT(*) AS n FROM items),
        draws AS (
          SELECT u.user_id, j.j,
                 CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '#'
                      || CAST(j.j AS VARCHAR)), 1, 8)) AS BIGINT)
                   % (SELECT n FROM nn) AS idx
          FROM (SELECT DISTINCT user_id FROM pos) u, range(0, 8) j(j)),
        cand AS (
          SELECT d.user_id, i.isbn, d.j
          FROM draws d JOIN items i USING (idx)
          ANTI JOIN pos p ON p.user_id = d.user_id AND p.isbn = i.isbn),
        ded AS (
          SELECT user_id, isbn, j FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, isbn ORDER BY j) AS rn
            FROM cand) WHERE rn = 1),
        keep AS (
          SELECT user_id, isbn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY j) AS rn
            FROM ded) WHERE rn <= 4)
        SELECT user_id, isbn, 1 AS label FROM pos
        UNION ALL
        SELECT user_id, isbn, 0 AS label FROM keep
        """
    ),
)


# Leave-one-out HR@k of the item-based CF recommender — the offline
# recsys evaluation (Sarwar 2001 scoring, NCF-style protocol) with an
# md5-deterministic holdout so both engines run the identical experiment.
_HOLDOUT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _holdout_flags(s: SparkSession, d: str) -> DataFrame:
    """One holdout-eval run per (app, sf_dir), shared by the HR/NDCG
    rollup and the bootstrap-CI face (same memoization contract as
    _QCLF_CACHE; cleared by reset_caches)."""
    key = (s.sparkContext.applicationId, d)
    res = _HOLDOUT_CACHE.get(key)
    if res is None:
        res = recommend.holdout_hit_flags(_ref(s, d).ratings, k=10).cache()
        _HOLDOUT_CACHE[key] = res
    return res


def _holdout_rollup(flags: DataFrame, k: int) -> DataFrame:
    return flags.agg(
        F.lit(int(k)).alias("k"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum("hit").alias("n_hits"),
        F.round(F.sum("hit") / F.count(F.lit(1)), 6).alias("hit_rate"),
        F.round(
            F.coalesce(
                F.sum(F.lit(1.0) / F.log2(F.col("_hit_rank") + 1)), F.lit(0.0)
            )
            / F.count(F.lit(1)),
            6,
        ).alias("ndcg"),
    )


register(
    "q_recsys_holdout_hitrate",
    lambda s, d: _holdout_rollup(_holdout_flags(s, d), k=10),
    _q(
        """
        , pos AS (SELECT DISTINCT user_id, isbn FROM ratings WHERE rating >= 6),
        eligible AS (
          SELECT user_id FROM pos GROUP BY user_id HAVING COUNT(*) >= 2),
        hv AS (
          SELECT p.user_id, p.isbn,
                 CAST(('0x' || substr(md5(CAST(p.user_id AS VARCHAR) || '#' || p.isbn),
                      1, 8)) AS BIGINT) AS h
          FROM pos p SEMI JOIN eligible e ON e.user_id = p.user_id),
        marked AS (
          SELECT user_id, isbn,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h DESC, isbn) AS rn
          FROM hv),
        ho AS (SELECT user_id, isbn FROM marked WHERE rn = 1),
        train AS (SELECT user_id, isbn FROM marked WHERE rn > 1),
        inter AS (
          SELECT a.isbn AS i1, b.isbn AS i2, COUNT(*) AS w
          FROM train a JOIN train b ON a.user_id = b.user_id AND a.isbn <> b.isbn
          GROUP BY 1, 2),
        deg AS (SELECT isbn, COUNT(*) AS dg FROM train GROUP BY isbn),
        sim AS (
          SELECT i1, i2,
                 ROUND(CAST(w AS DOUBLE) / (d1.dg + d2.dg - w), 6) AS s
          FROM inter
          JOIN deg d1 ON d1.isbn = inter.i1
          JOIN deg d2 ON d2.isbn = inter.i2),
        scores AS (
          SELECT t.user_id, s.i2 AS cand, ROUND(SUM(s.s), 6) AS sc
          FROM train t JOIN sim s ON s.i1 = t.isbn
          GROUP BY 1, 2),
        unseen AS (
          SELECT sc.user_id, sc.cand, sc.sc FROM scores sc
          ANTI JOIN train t ON t.user_id = sc.user_id AND t.isbn = sc.cand),
        ranked AS (
          SELECT user_id, cand,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sc DESC, cand) AS r
          FROM unseen),
        hits AS (
          SELECT r.user_id, r.r FROM ranked r
          JOIN ho ON ho.user_id = r.user_id AND ho.isbn = r.cand
          WHERE r.r <= 10)
        SELECT 10 AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM eligible) AS n_users,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits,
               ROUND((SELECT COUNT(*) FROM hits) * 1.0
                     / (SELECT COUNT(*) FROM eligible), 6) AS hit_rate,
               ROUND((SELECT COALESCE(SUM(1.0 / log2(r + 1)), 0.0) FROM hits)
                     / (SELECT COUNT(*) FROM eligible), 6) AS ndcg
        """
    ),
)


# Hour-of-day periodicity: Pearson chi-square vs the uniform 24-hour
# expectation (zero-event hours contribute e each), UTC-epoch hours so
# it is session-timezone-proof.
register(
    "q_events_periodicity",
    lambda s, d: events.hourly_periodicity(_ref(s, d).events),
    """
    WITH counts AS (
      SELECT event_type,
             CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, SUM(c) AS n FROM counts GROUP BY 1),
    rk AS (
      SELECT counts.event_type, hour, c, n,
             ROW_NUMBER() OVER (PARTITION BY counts.event_type
                                ORDER BY c DESC, hour) AS r
      FROM counts JOIN tot ON tot.event_type = counts.event_type)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           ROUND(SUM(POW(c - n / 24.0, 2) / (n / 24.0))
                 + (24 - COUNT(*)) * (MAX(n) / 24.0), 6) AS chi2,
           MAX(CASE WHEN r = 1 THEN hour END) AS peak_hour,
           ROUND(MAX(CASE WHEN r = 1 THEN c END) * 1.0 / MAX(n), 6) AS peak_share
    FROM rk GROUP BY event_type
    """,
)


# The release datasheet (Gebru et al. 2021): composition, concentration
# and redundancy of the corpus in one oracle-checked row.
register(
    "q_corpus_datasheet",
    lambda s, d: diagnostics.corpus_datasheet(_docs(s, d)),
    _q_docs(
        """
        , bds AS (
          SELECT d.doc_id,
                 md5(array_to_string(list_sort(list_distinct(
                     string_split(n.norm, ' '))), ' ')) AS fp,
                 CAST(len(t.t) AS BIGINT) AS nt, d.source AS src, d.lang
          FROM documents d JOIN toks t USING (doc_id)
                           JOIN norm n ON n.doc_id = d.doc_id),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources,
                 CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                 CAST(SUM(nt) AS BIGINT) AS n_tokens,
                 CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fp,
                 CAST(SUM(CASE WHEN nt < 50 THEN 1 ELSE 0 END) AS BIGINT) AS short_n
          FROM bds),
        st AS (
          SELECT MAX(c) AS top_src FROM (
            SELECT COUNT(*) AS c FROM bds GROUP BY src)),
        lh AS (
          SELECT ROUND(-SUM((c * 1.0 / n) * log2(c * 1.0 / n)), 6)
                   AS lang_entropy_bits
          FROM (SELECT lang, COUNT(*) AS c FROM bds GROUP BY lang),
               (SELECT COUNT(*) AS n FROM bds))
        SELECT n_docs, n_sources, n_langs, n_tokens,
               ROUND(n_tokens * 1.0 / n_docs, 6) AS mean_doc_tokens,
               ROUND(1.0 - n_fp * 1.0 / n_docs, 6) AS dup_doc_fraction,
               ROUND(short_n * 1.0 / n_docs, 6) AS short_doc_fraction,
               ROUND(top_src * 1.0 / n_docs, 6) AS top_source_share,
               lang_entropy_bits
        FROM m, st, lh
        """
    ),
)


# Pairwise dependence of the fused quality signals: Pearson (corr
# aggregate, the assortativity precedent) + exact midrank Spearman —
# the redundancy check behind multi-signal filtering.
register(
    "q_text_signal_corr",
    lambda s, d: textstats.signal_correlations(_docs(s, d)),
    _q_docs(
        f"""
        , tokc AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
        swc AS (
          SELECT doc_id,
                 ROUND(AVG(CASE WHEN token IN ({_SW_EN}) THEN 1.0 ELSE 0.0 END), 6) AS sw
          FROM tokc GROUP BY doc_id),
        basec AS (SELECT doc_id, norm FROM norm WHERE length(norm) >= 2),
        gramsc AS (
          SELECT doc_id, unnest([substr(norm, i, 2) for i in range(1, length(norm))]) AS bigram
          FROM basec),
        bigc AS (SELECT bigram, COUNT(*) AS cnt FROM gramsc GROUP BY bigram),
        prec AS (SELECT substr(bigram, 1, 1) AS c1, SUM(cnt) AS tot FROM bigc GROUP BY 1),
        modelc AS (
          SELECT bigram, log2(CAST(cnt AS DOUBLE) / tot) AS lp
          FROM bigc JOIN prec ON substr(bigc.bigram, 1, 1) = prec.c1),
        lmc AS (
          SELECT doc_id, ROUND(AVG(lp), 6) AS lm
          FROM gramsc JOIN modelc USING (bigram) GROUP BY doc_id),
        tcc AS (SELECT doc_id, token, COUNT(*) AS c FROM tokc GROUP BY 1, 2),
        lexc AS (
          SELECT doc_id, ROUND(COUNT(*) * 1.0 / SUM(c), 6) AS lex
          FROM tcc GROUP BY doc_id),
        jc AS (
          SELECT swc.doc_id, sw, lm, lex
          FROM swc JOIN lmc USING (doc_id) JOIN lexc USING (doc_id)),
        rc AS (
          SELECT doc_id, sw, lm, lex,
                 RANK() OVER (ORDER BY sw) + (COUNT(*) OVER (PARTITION BY sw) - 1) / 2.0 AS rsw,
                 RANK() OVER (ORDER BY lm) + (COUNT(*) OVER (PARTITION BY lm) - 1) / 2.0 AS rlm,
                 RANK() OVER (ORDER BY lex) + (COUNT(*) OVER (PARTITION BY lex) - 1) / 2.0 AS rlex
          FROM jc)
        SELECT 'sw' AS signal_a, 'lm' AS signal_b,
               ROUND(corr(sw, lm), 6) AS pearson, ROUND(corr(rsw, rlm), 6) AS spearman
        FROM rc
        UNION ALL
        SELECT 'sw', 'lex', ROUND(corr(sw, lex), 6), ROUND(corr(rsw, rlex), 6) FROM rc
        UNION ALL
        SELECT 'lm', 'lex', ROUND(corr(lm, lex), 6), ROUND(corr(rlm, rlex), 6) FROM rc
        """
    ),
)


# Deterministic bootstrap CI for HR@10 (Efron 1979, md5 resampling):
# the error bar the offline eval owes its reader. Replicate means are
# sums of 0/1 flags — exact integers in double, so no float-order
# hazard anywhere in the resampling.
register(
    "q_recsys_hitrate_ci",
    lambda s, d: evaluate.bootstrap_ci(
        _holdout_flags(s, d).select(
            F.col("user_id").alias("unit_id"),
            F.col("hit").cast("double").alias("value"),
        ),
        n_replicates=100,
    ),
    _q(
        """
        , pos AS (SELECT DISTINCT user_id, isbn FROM ratings WHERE rating >= 6),
        eligible AS (
          SELECT user_id FROM pos GROUP BY user_id HAVING COUNT(*) >= 2),
        hv AS (
          SELECT p.user_id, p.isbn,
                 CAST(('0x' || substr(md5(CAST(p.user_id AS VARCHAR) || '#' || p.isbn),
                      1, 8)) AS BIGINT) AS h
          FROM pos p SEMI JOIN eligible e ON e.user_id = p.user_id),
        marked AS (
          SELECT user_id, isbn,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h DESC, isbn) AS rn
          FROM hv),
        ho AS (SELECT user_id, isbn FROM marked WHERE rn = 1),
        train AS (SELECT user_id, isbn FROM marked WHERE rn > 1),
        inter AS (
          SELECT a.isbn AS i1, b.isbn AS i2, COUNT(*) AS w
          FROM train a JOIN train b ON a.user_id = b.user_id AND a.isbn <> b.isbn
          GROUP BY 1, 2),
        deg AS (SELECT isbn, COUNT(*) AS dg FROM train GROUP BY isbn),
        sim AS (
          SELECT i1, i2,
                 ROUND(CAST(w AS DOUBLE) / (d1.dg + d2.dg - w), 6) AS s
          FROM inter
          JOIN deg d1 ON d1.isbn = inter.i1
          JOIN deg d2 ON d2.isbn = inter.i2),
        scores AS (
          SELECT t.user_id, s.i2 AS cand, ROUND(SUM(s.s), 6) AS sc
          FROM train t JOIN sim s ON s.i1 = t.isbn
          GROUP BY 1, 2),
        unseen AS (
          SELECT sc.user_id, sc.cand, sc.sc FROM scores sc
          ANTI JOIN train t ON t.user_id = sc.user_id AND t.isbn = sc.cand),
        rankedq AS (
          SELECT user_id, cand,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sc DESC, cand) AS r
          FROM unseen),
        hitsq AS (
          SELECT DISTINCT r.user_id FROM rankedq r
          JOIN ho ON ho.user_id = r.user_id AND ho.isbn = r.cand
          WHERE r.r <= 10),
        flags AS (
          SELECT e.user_id,
                 CASE WHEN h.user_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS v
          FROM eligible e LEFT JOIN hitsq h USING (user_id)),
        ru AS (
          SELECT user_id, v, ROW_NUMBER() OVER (ORDER BY user_id) - 1 AS idx
          FROM flags),
        nn2 AS (SELECT COUNT(*) AS n FROM ru),
        draws AS (
          -- ru itself supplies the j counter 0..n-1 (DuckDB's range()
          -- cannot take a subquery bound)
          SELECT b.b,
                 CAST(('0x' || substr(md5(CAST(b.b AS VARCHAR) || '#'
                      || CAST(j.idx AS VARCHAR)), 1, 8)) AS BIGINT)
                   % (SELECT n FROM nn2) AS idx
          FROM range(0, 100) b(b), ru j),
        reps AS (
          SELECT b, SUM(v) / (SELECT n FROM nn2) AS m
          FROM draws JOIN ru USING (idx) GROUP BY b),
        rr AS (SELECT m, b, ROW_NUMBER() OVER (ORDER BY m, b) AS r FROM reps)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ru) AS n_units,
               100 AS n_replicates,
               ROUND((SELECT AVG(v) FROM ru), 6) AS mean,
               ROUND((SELECT m FROM rr WHERE r = 3), 6) AS ci_lo,
               ROUND((SELECT m FROM rr WHERE r = 98), 6) AS ci_hi
        """
    ),
)


# Exact join-size audit for the co-rating self-join input: the
# explosion/skew pre-check computed from key histograms alone
# (Σ c(k)², max c(k)², top-5 share) — the decision input behind the
# fanout cap / salting / AQE settings that join carries.
register(
    "q_diag_join_size",
    lambda s, d: diagnostics.join_size_audit(
        corating.positive_ratings(_ref(s, d).ratings),
        corating.positive_ratings(_ref(s, d).ratings),
        ["isbn"],
        top_n=5,
    ),
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        hist AS (SELECT isbn, CAST(COUNT(*) AS BIGINT) AS c FROM pos GROUP BY isbn),
        contrib AS (SELECT c * c AS rows_ FROM hist),
        tot AS (
          SELECT CAST(SUM(rows_) AS BIGINT) AS join_rows,
                 CAST(MAX(rows_) AS BIGINT) AS max_key_rows
          FROM contrib),
        topn AS (
          SELECT CAST(SUM(rows_) AS BIGINT) AS top_sum FROM (
            SELECT rows_ FROM contrib ORDER BY rows_ DESC LIMIT 5)),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM pos)
        SELECT n.n_rows AS n_left, n.n_rows AS n_right,
               COALESCE(join_rows, 0) AS join_rows,
               COALESCE(max_key_rows, 0) AS max_key_rows,
               CASE WHEN join_rows > 0
                    THEN ROUND(top_sum * 1.0 / join_rows, 6)
                    ELSE NULL END AS top_keys_share
        FROM n, tot, topn
        """
    ),
)


# Butterfly (2x2 biclique) statistics of the user-item bipartite graph
# (Sanei-Mehri KDD 2018): Sigma C(w,2) off the co-rating weight table —
# the cohesion number that says whether the projections carry structure.
register(
    "q_graph_butterflies",
    lambda s, d: corating.butterfly_count(_ref(s, d).ratings),
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        copairs AS (
          SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS w
          FROM pos a JOIN pos b USING (isbn)
          WHERE a.user_id < b.user_id
          GROUP BY 1, 2),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_copairs,
                 CAST(SUM(w * (w - 1) // 2) AS BIGINT) AS n_butterflies,
                 CAST(MAX(w * (w - 1) // 2) AS BIGINT) AS max_pair_butterflies
          FROM copairs),
        sides AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                 CAST(COUNT(DISTINCT isbn) AS BIGINT) AS n_items
          FROM pos)
        SELECT n_users, n_items,
               COALESCE(n_copairs, 0) AS n_copairs,
               COALESCE(n_butterflies, 0) AS n_butterflies,
               COALESCE(max_pair_butterflies, 0) AS max_pair_butterflies
        FROM sides, st
        """
    ),
)


# The CAPPED butterfly face (round-8 VERDICT item 4): the scale-safe
# path — max_raters_per_book=8 deterministically keeps the 8 lowest
# user_ids per item before the self-join (at sf0.01 the cap binds on
# ~89% of items, max degree 27) — oracle-attested with the identical
# row_number() <= 8 pre-filter, so the capped approximation itself is
# hash-checked, not just unit-tested. n_users/n_items stay exact
# (computed from the uncapped positive table, like the engine).
register(
    "q_graph_butterflies_capped",
    lambda s, d: corating.butterfly_count(
        _ref(s, d).ratings, max_raters_per_book=8
    ),
    _q(
        """
        , pos AS (SELECT user_id, isbn FROM ratings WHERE rating >= 6),
        capped AS (
          SELECT user_id, isbn FROM (
            SELECT user_id, isbn,
                   ROW_NUMBER() OVER (PARTITION BY isbn ORDER BY user_id) AS rn
            FROM pos) WHERE rn <= 8),
        copairs AS (
          SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS w
          FROM capped a JOIN capped b USING (isbn)
          WHERE a.user_id < b.user_id
          GROUP BY 1, 2),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_copairs,
                 CAST(SUM(w * (w - 1) // 2) AS BIGINT) AS n_butterflies,
                 CAST(MAX(w * (w - 1) // 2) AS BIGINT) AS max_pair_butterflies
          FROM copairs),
        sides AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                 CAST(COUNT(DISTINCT isbn) AS BIGINT) AS n_items
          FROM pos)
        SELECT n_users, n_items,
               COALESCE(n_copairs, 0) AS n_copairs,
               COALESCE(n_butterflies, 0) AS n_butterflies,
               COALESCE(max_pair_butterflies, 0) AS max_pair_butterflies
        FROM sides, st
        """
    ),
)


# Catalog concentration: exact Gini of per-item interaction counts +
# top-decile share — the long-tail profile behind recsys coverage and
# popularity-corrected negative sampling.
register(
    "q_recsys_popularity_gini",
    lambda s, d: corating.popularity_gini(_ref(s, d).ratings, min_rating=0),
    _q(
        """
        , counts AS (SELECT isbn, CAST(COUNT(*) AS BIGINT) AS c
                     FROM ratings WHERE isbn IS NOT NULL GROUP BY isbn),
        ranked AS (
          SELECT c, ROW_NUMBER() OVER (ORDER BY c, isbn) AS r FROM counts),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS tot
               FROM counts)
        SELECT n AS n_items, tot AS n_interactions,
               ROUND((2.0 * SUM(r * c)) / (n * tot) - (n + 1.0) / n, 6) AS gini,
               ROUND(SUM(CASE WHEN r > n - (n + 9) // 10 THEN c ELSE 0 END)
                     * 1.0 / tot, 6) AS top_decile_share
        FROM ranked, nt
        GROUP BY n, tot
        """
    ),
)


# DAU/MAU stickiness over the stream's span — the engagement ratio in
# one row, epoch-UTC days (timezone-proof like the rest of the module).
register(
    "q_events_stickiness",
    lambda s, d: events.stickiness_report(_ref(s, d).events),
    """
    WITH du AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
    daily AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(dau) AS BIGINT) AS dau_sum
      FROM daily),
    m AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM events)
    SELECT n_days,
           ROUND(dau_sum * 1.0 / n_days, 6) AS avg_dau,
           mau,
           ROUND(dau_sum * 1.0 / n_days / mau, 6) AS stickiness
    FROM agg, m
    """,
)


# Source signature terms: tf-idf lifted to the source grain — each
# feed's most distinctive tokens, the drift-triage companion to the JS
# matrix (tokens in every source idf-out by construction).
register(
    "q_text_source_signatures",
    lambda s, d: textstats.source_signatures(_docs(s, d), top_n=5),
    _q_docs(
        """
        , toksg AS (
          SELECT d.source, unnest(t.t) AS token
          FROM toks t JOIN documents d USING (doc_id)),
        tf AS (SELECT source, token, COUNT(*) AS tf FROM toksg GROUP BY 1, 2),
        tot AS (SELECT source, SUM(tf) AS tot FROM tf GROUP BY source),
        sdf AS (SELECT token, COUNT(*) AS sdf FROM tf GROUP BY token),
        ns AS (SELECT COUNT(*) AS n FROM tot),
        scored AS (
          SELECT tf.source, tf.token,
                 ROUND((CAST(tf AS DOUBLE) / tot)
                       * ln(CAST((SELECT n FROM ns) AS DOUBLE) / sdf), 6) AS tfidf
          FROM tf JOIN tot ON tot.source = tf.source
                  JOIN sdf ON sdf.token = tf.token)
        SELECT source, token, tfidf FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY tfidf DESC, token) AS rn
          FROM scored) WHERE rn <= 5
        """
    ),
)


# --- rows-only -> attestable-twin map (round-4 discipline) ------------------
#
# Every rows-only query must name an oracle-backed companion that value-
# hash checks the same machinery (tests/test_oracle_parity.py enforces
# this at registration time, so a future rows-only operator cannot land
# without its twin). Keys are rows-only names; values are oracle-backed.

ROWS_ONLY_TWINS: dict[str, str] = {
    "q_simsearch_ivf": "q_simsearch_ivf_exact",
    "q_simsearch_ivfpq": "q_simsearch_ivfpq_exact",
    "q_simsearch_pq": "q_simsearch_pq_exact",
    "q_simsearch_opq": "q_simsearch_opq_exact",
    "q_corpus_cluster": "q_corpus_cluster_assign",
    "q_emb_pca": "q_emb_pca_moments",
    "q_corpus_bpe": "q_corpus_bpe_merges",
    "q_events_approx_percentiles": "q_events_approx_bounds",
    "q_events_approx_users": "q_events_approx_users_bounds",
    "q_multimodal_features": "q_multimodal_features_digest",
    "q_multimodal_resize": "q_multimodal_resize_digest",
    "q_multimodal_frames": "q_multimodal_frames_digest",
    "q_louvain_communities": "q_louvain_invariants",
    "q_louvain_modularity": "q_louvain_invariants",
    "q_pipeline_similar_to": "q_pipeline_invariants",
    "q_pipeline_communities": "q_pipeline_invariants",
    "q_pipeline_community_stats": "q_pipeline_invariants",
    "q_pipeline_community_members": "q_pipeline_invariants",
    "q_pipeline_knn_recommend": "q_pipeline_invariants",
    "q_pipeline_comm_recommend": "q_pipeline_invariants",
    "q_pipeline_modularity": "q_pipeline_invariants",
    "q_pipeline_fastrp_digest": "q_pipeline_invariants",
    "q_pipeline_fastrp_embeddings": "q_pipeline_invariants",
    "q_recsys_als": "q_recsys_als_invariants",
    "q_emb_deepwalk": "q_emb_deepwalk_invariants",
    "q_corpus_semantic_dedup": "q_corpus_semantic_dedup_exact",
    "q_corpus_quality_clf": "q_corpus_quality_clf_invariants",
}


# --- driver-window ordering -------------------------------------------------
#
# The verify driver hash-checks the FIRST 50 entries of ``oracle_sql()`` in
# iteration order (verified in VERDICT.md round 2: the CORRECTNESS_r02 key
# set equals ``set(list(oracle_sql())[:50])``).  With more than 50
# oracle-backed queries registered, plain registration order would starve the
# tail forever, so both ``queries()`` and ``oracle_sql()`` are returned
# sorted by (driver attestation count, registration index): queries the
# driver has never hash-checked come first, then once-checked, then the
# twice-green ones.
#
# Attestation counts are read AUTOMATICALLY from the driver's own
# CORRECTNESS_r*.json artifacts in the repo root (a green hash row = one
# attestation), so no per-round maintenance is needed: newly registered
# queries have no rows and land at the front of the next window.
# ``_ATTESTATIONS_STALE_BEFORE`` handles operator rewrites: rows from
# rounds before the given number no longer cover the current code
# (q_events_asof was rewritten in round 2 after its green r1 row).
# If no artifacts can be read (e.g. the package imported outside the
# repo) every count is zero and plain registration order applies.

_ATTESTATIONS_STALE_BEFORE: dict[str, int] = {
    "q_events_asof": 2,
    # Round-9 bisect of the r08 q_ingest_compaction red row (VERDICT item
    # 1a): zonemaps shares the whole events-ts decode + file/stats
    # pipeline and must land in the SAME driver window as compaction, so
    # its green r07 row stops counting — zonemaps green + compaction red
    # would localize the divergence to the cumsum/DIV tail; both green
    # closes the item.
    "q_ingest_zonemaps": 9,
}


def _count_attestations() -> dict[str, tuple[int, int]] | None:
    """name -> (row count, last round appeared). The last round is
    the second rotation key (round-4 VERDICT item 4): once every oracle
    query has >=1 green row, ties within a count bucket re-attest
    oldest-first instead of registration-order-first, so rows from early
    rounds keep getting refreshed as the code underneath them moves.

    Rows-only queries leave ``err == "no_oracle"`` rows in the driver
    artifacts; those appearances count here too (round-5 VERDICT item 1):
    ranking rows-only queries by their REAL last appearance instead of a
    pinned ``(1, 0)`` stops them from permanently occupying the front of
    the window and starving once-attested oracle queries (the §2.8
    serving catalog sat un-re-attested since r02 because of this)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    counts: dict[str, tuple[int, int]] = {}
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        return None
    try:
        for path in files:
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            rnd = int(m.group(1)) if m else 0
            with open(path) as fh:
                rows = json.load(fh)
            for name, row in rows.items():
                if rnd < _ATTESTATIONS_STALE_BEFORE.get(name, 0):
                    continue
                if not isinstance(row, dict):
                    continue
                green = row.get("hash_match") and not row.get("err")
                # A rows-only run: the driver executed the query (it has a
                # Spark row count) but had no oracle to hash against.
                rows_only = (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                if green or rows_only:
                    c, last = counts.get(name, (0, 0))
                    counts[name] = (c + 1, max(last, rnd))
    except (OSError, ValueError, KeyError):
        return None
    return counts



# If no artifacts are readable (package imported outside the repo), every
# oracle query counts as never-attested and the window falls back to plain
# registration order — predictable, and never stale (round-3 VERDICT item 4:
# the old hardcoded fallback dict silently drifted out of date).
_DRIVER_ATTESTATIONS: dict[str, tuple[int, int]] = _count_attestations() or {}


def _window_order() -> list[str]:
    names = list(QUERIES)
    reg_index = {name: i for i, name in enumerate(names)}
    # Rows-only queries leave no_oracle rows in the artifacts, which
    # _count_attestations counts like green rows, so everything rotates
    # on its real history — no pinned rank for any class.  Primary key is
    # LAST ROUND SEEN (LRU): the driver artifact's value is freshness, and
    # a query last attested three rounds of registry churn ago is the one
    # most in need of re-attestation regardless of how many early-round
    # rows it accumulated (round-5 VERDICT item 1: the §2.8 serving
    # catalog sat at (count=2, last=r02) behind every count-1 query under
    # the old count-first key).  Count breaks ties within a round so the
    # least-often-seen go first; never-attested queries are (0, 0) and
    # stay at the very front.
    def key(name: str) -> tuple[int, int, int]:
        count, last_round = _DRIVER_ATTESTATIONS.get(name, (0, 0))
        return (last_round, count, reg_index[name])

    return sorted(names, key=key)


def queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name][0] for name in _window_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name][1]
        for name in _window_order()
        if QUERIES[name][1] is not None
    }
