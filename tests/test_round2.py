"""Round-2 operator tests: de-shuffled shingles, 64-bit banded
SimHash, rebuilt ANN LSH top-k (+ recall gauge + partition pruning),
multimodal count oracle, native population formatting, city-dim
union in the search path, TREC sink formatting, streaming epoch
idempotency, lineage glob consistency."""

import hashlib
import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import dedup as D
from search_engine_spark.operators import multimodal as MM
from search_engine_spark.operators import similarity as SIM
from search_engine_spark.operators.cities import (
    cities_dim,
    format_population,
    make_city_docs,
    read_dim,
    write_cities_dim,
    write_languages_dim,
)
from search_engine_spark.operators.textstats import TOKEN_SPLIT_RE

SF_001 = "/root/testdata/sf0.001"


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]


# ---------------------------------------------------------------------------
# shingles: the Arrow kernel is the exact twin of the relational spec

def test_shingle_rows_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "a b"),                       # < n tokens -> no shingles
         (3, "x,y;z x y z x y z"),         # dups collapse
         (4, None)],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["s"]) for r in D.shingle_rows(docs, n=3).collect()}
    want = set()
    for doc_id, text in [(1, "the quick brown fox jumps"), (2, "a b"),
                         (3, "x,y;z x y z x y z")]:
        toks = _py_tokens(text)
        for i in range(len(toks) - 2):
            want.add((doc_id, " ".join(toks[i:i + 3])))
    assert got == want


def test_shingle_rows_plan_has_no_keyed_exchange(spark):
    """Shingling must never shuffle token/shingle rows by key; the
    only permissible exchange is the round-robin input-balance pass
    that un-serializes a single-row-group parquet input."""
    # this test pins the RAW operator's plan: an earlier test may have
    # populated the shared shingle cache over this corpus, and Spark's
    # CacheManager would then substitute the InMemoryRelation (whose
    # stored build plan carries its own Exchange string) into the
    # fragment — a different (beneficial) serving regime, not the
    # shape under test
    D.clear_shingle_cache()
    docs = spark.read.parquet(os.path.join(SF_001, "documents.parquet"))
    plan = D.shingle_rows(docs)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    # the testdata file IS single-row-group, so the balance guard fires
    assert plan.count("Exchange") <= 1


# ---------------------------------------------------------------------------
# 64-bit banded SimHash

def _py_simhash_bands(text: str, bits: int = 64, n_bands: int = 4) -> tuple:
    sums = [0] * bits
    for tok in _py_tokens(text):
        h = hashlib.md5(tok.encode()).hexdigest()
        for j in range(bits):
            nibble = int(h[j // 4], 16)
            sums[j] += 1 if (nibble >> (j % 4)) & 1 else -1
    band_bits = bits // n_bands
    bands = []
    for k in range(n_bands):
        v = 0
        for jj in range(band_bits):
            if sums[k * band_bits + jj] > 0:
                v |= 1 << jj
        bands.append(v)
    return tuple(bands)


def test_simhash_bands_match_python_reference(spark):
    texts = [(1, "alpha beta gamma delta epsilon"),
             (2, "alpha beta gamma delta zeta"),
             (3, "totally different words here now")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in D.simhash_bands(docs).collect()}
    for doc_id, text in texts:
        assert got[doc_id] == _py_simhash_bands(text), doc_id


def test_simhash_near_pairs_banded(spark):
    # identical docs -> hamming 0; near docs -> small hamming;
    # unrelated docs must not pair at max_hamming=3
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta theta"),
         (3, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in D.simhash_near_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # pigeonhole precondition is enforced
    with pytest.raises(AssertionError):
        D.simhash_near_pairs(docs, max_hamming=4, n_bands=4)


# ---------------------------------------------------------------------------
# ANN LSH top-k: exact-within-probe semantics + recall gauge + pruning

def _np_embeddings(spark):
    rows = (spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
            .orderBy("vec_id").collect())
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, m


def test_ann_lsh_topk_exact_within_probe(spark):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    qvec = m[0].tolist()

    got = [(r["vec_id"], r["cosine"]) for r in SIM.ann_lsh_topk(emb, qvec, k=10).collect()]

    # numpy reference: same planes, same buckets, same probe set
    planes = np.array(SIM._planes(len(qvec), 8), dtype=np.float64)
    weights = (1 << np.arange(8)).astype(np.int64)
    buckets = ((m @ planes.T) >= 0) @ weights
    probe = set(SIM.query_bucket_and_probe(qvec, 8, 1))
    mask = np.isin(buckets, list(probe))
    cos = (m[mask] @ m[0]) / (np.linalg.norm(m[mask], axis=1) * np.linalg.norm(m[0]))
    ref = sorted(
        ((int(i), float(c)) for i, c in zip(ids[mask], np.round(cos, 6))),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == ref


def test_ann_lsh_topk_recall_vs_exact(spark):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    qvec = m[0].tolist()
    approx = {r["vec_id"] for r in SIM.ann_lsh_topk(emb, qvec, k=10).collect()}
    exact = {r["vec_id"] for r in SIM.cosine_topk(emb, qvec, k=10).collect()}
    recall = len(approx & exact) / 10
    # labelled/clustered synthetic embeddings: the probed neighborhood
    # holds most true neighbors; pin a floor so a bucketing regression
    # (wrong planes, wrong probe set) fails loudly
    assert recall >= 0.5, f"recall@10 {recall}"


def test_ann_bucketed_table_partition_prunes(spark, tmp_dir):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    qvec = m[0].tolist()
    path = os.path.join(tmp_dir, "emb_bucketed")
    SIM.write_bucketed_embeddings(emb, path)

    out = SIM.ann_lsh_topk_pruned(spark, path, qvec, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    got = [(r["vec_id"], r["cosine"]) for r in out.collect()]
    want = [(r["vec_id"], r["cosine"]) for r in SIM.ann_lsh_topk(emb, qvec, k=10).collect()]
    assert got == want


def test_dedup_clusters_transitive(spark):
    """Connected components: chained pairs merge into one cluster with
    the minimum doc as keeper, independent clusters stay apart."""
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (9, 12),        # chain -> one cluster, keep 1
         (20, 21),                        # separate cluster, keep 20
         (30, 31), (32, 31)],             # V-shape -> keep 30
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in D.dedup_clusters(pairs).collect()}
    assert got == {
        1: (1, True), 5: (1, False), 9: (1, False), 12: (1, False),
        20: (20, True), 21: (20, False),
        30: (30, True), 31: (30, False), 32: (30, False),
    }
    # a component whose diameter exceeds the round cap must REFUSE
    # (unconverged labels would silently keep duplicate docs)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 16)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(chain, max_iters=2)


# ---------------------------------------------------------------------------
# IVF ANN: exact-within-probe semantics, recall gauge, pruning

def test_ivf_topk_exact_within_probe(spark):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    qvec = m[0].tolist()
    got = [(r["vec_id"], r["cosine"]) for r in SIM.ivf_topk(emb, qvec, k=10).collect()]

    cents = m[:16]
    sims = SIM._round6_half_up(
        (m @ cents.T) / (np.linalg.norm(m, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :])
    )
    cid = np.argmax(sims, axis=1)
    probe = set(SIM.ivf_probe_centroids(emb, qvec))
    mask = np.isin(cid, list(probe))
    cos = np.round((m[mask] @ m[0]) / (np.linalg.norm(m[mask], axis=1) * np.linalg.norm(m[0])), 6)
    ref = sorted(
        ((int(i), float(c)) for i, c in zip(ids[mask], cos)),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == ref


def test_ivf_recall_and_pruned_table(spark, tmp_dir):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    qvec = m[0].tolist()

    approx = {r["vec_id"] for r in SIM.ivf_topk(emb, qvec, k=10).collect()}
    exact = {r["vec_id"] for r in SIM.cosine_topk(emb, qvec, k=10).collect()}
    assert len(approx & exact) / 10 >= 0.5

    path = os.path.join(tmp_dir, "ivf")
    SIM.write_ivf_index(emb, path)
    out = SIM.ivf_topk_pruned(spark, path, emb, qvec, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    got = [(r["vec_id"], r["cosine"]) for r in out.collect()]
    want = [(r["vec_id"], r["cosine"]) for r in SIM.ivf_topk(emb, qvec, k=10).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# multimodal: counts kernel == numpy reference; blob == utf-8 bytes

def test_decode_media_counts_reference(spark):
    media = MM.media_from_documents(spark, SF_001).limit(20)
    rows = media.collect()
    got = {r["media_id"]: r for r in MM.decode_media_counts(media).collect()}
    for r in rows:
        arr = np.frombuffer(bytes(r["blob"]), dtype=np.uint8)
        counts = np.bincount(arr >> 4, minlength=16)
        g = got[r["media_id"]]
        assert g["n_bytes"] == arr.size
        assert [g[f"h{k}"] for k in range(16)] == counts.tolist()


def test_resize_media_nearest_neighbor(spark):
    media = MM.media_from_documents(spark, SF_001).limit(10)
    src = {r["media_id"]: bytes(r["blob"]) for r in media.collect()}
    got = {r["media_id"]: r for r in MM.resize_media(media, 64).collect()}
    for mid, b in src.items():
        arr = np.frombuffer(b, dtype=np.uint8)
        if arr.size > 64:
            idx = (np.arange(64, dtype=np.int64) * arr.size) // 64
            want = arr[idx].tobytes()
        else:
            want = b
        assert bytes(got[mid]["blob_out"]) == want
        assert got[mid]["n_bytes_in"] == arr.size


def test_media_blob_is_utf8_text(spark):
    docs = spark.read.parquet(os.path.join(SF_001, "documents.parquet")).limit(5)
    media = {r["media_id"]: bytes(r["blob"])
             for r in MM.media_from_documents(spark, SF_001).limit(5).collect()}
    for r in docs.collect():
        assert media[r["doc_id"]] == r["text"].encode("utf-8")


# ---------------------------------------------------------------------------
# winnowing fingerprints + BPE-ish token counting

def test_winnow_shares_fingerprints_on_overlap(spark):
    import hashlib

    from search_engine_spark.operators.textstats import winnow_fingerprint

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, f"intro words here {shared} tail one"),
         (2, f"different start {shared} other ending"),
         (3, "completely unrelated vocabulary set nothing common")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in winnow_fingerprint(docs).collect()}
    assert all(rows[d]["n_fps"] > 0 for d in (1, 2, 3))

    # recompute the full mins sets driver-side to check overlap behavior
    def mins(text, k=3, w=4):
        toks = text.lower().split()
        hs = [int(hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()[:8], 16)
              for i in range(len(toks) - k + 1)]
        return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}

    m1 = mins(f"intro words here {shared} tail one")
    m2 = mins(f"different start {shared} other ending")
    m3 = mins("completely unrelated vocabulary set nothing common")
    assert m1 & m2, "a 10-token overlap must share winnowed fingerprints"
    assert not (m1 & m3)
    # and the Spark kernel agrees with this driver-side reference
    assert rows[1]["fp_hash"] == hashlib.md5(
        ",".join(str(x) for x in sorted(m1)).encode()).hexdigest()


def test_token_count_bpe_reference(spark):
    import re as _re

    from search_engine_spark.operators.textstats import BPE_ISH_RE, token_count_bpe

    texts = ["It's a test-case, 42 times! don't worry (v2.0)", "hello   world", "a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_count_bpe(docs).collect()}
    for i, t in enumerate(texts):
        pieces = _re.findall(BPE_ISH_RE, t)
        assert got[i]["n_pieces"] == len(pieces), t
        assert got[i]["n_distinct_pieces"] == len(set(pieces)), t


# ---------------------------------------------------------------------------
# cities: native formatting == Java reference rule; persisted dims; tags

def test_population_display_native_matches_python(spark):
    vals = [0, 1, 500, 999, 1000, 1234, 4500, 67000, 999999, 1000000,
            1500000, 67215293, 125836021, 999999999, 1000000000,
            1500000000, 32971854, 329484123]
    df = spark.createDataFrame([(v,) for v in vals], "population long")
    from search_engine_spark.operators.cities import population_display_col

    got = {r["population"]: r["d"] for r in df.select(
        "population", population_display_col(F.col("population")).alias("d")).collect()}
    for v in vals:
        assert got[v] == format_population(v), v


def test_cities_dim_uses_no_python_udf(spark):
    plan = cities_dim(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_persisted_dims_roundtrip(spark, tmp_dir):
    dim = cities_dim(spark)
    p1 = os.path.join(tmp_dir, "cities_dim")
    write_cities_dim(dim, p1)
    back = read_dim(spark, p1)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in dim.collect()}

    pages = spark.createDataFrame(
        [("u1", "en"), ("u2", "en"), ("u3", None)], "url string, lang string")
    p2 = os.path.join(tmp_dir, "langs_dim")
    write_languages_dim(pages, p2)
    langs = {r["lang"]: r["n_docs"] for r in read_dim(spark, p2).collect()}
    assert langs == {"en": 2, None: 1}


def test_city_docs_union_extends_posting_membership(spark, built_index):
    """The reference unions <F P=104>-tagged docs with posting
    membership (Searcher.java:315-327): a doc NOT containing the city
    term must pass the filter when the dim tags it."""
    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)

    base = [r["url"] for r in eng.search("world trade", 50).collect()]
    assert base, "fixture corpus must match the query"
    # posting membership alone: no doc contains the fake city term
    assert eng.search("world trade", 50, cities=["zzznocity"]).count() == 0

    # tag two result docs with the fake city -> exactly those return
    eng.city_docs = spark.createDataFrame(
        [("zzznocity", base[0]), ("zzznocity", base[1])], "city string, url string")
    got = {r["url"] for r in eng.search("world trade", 50, cities=["zzznocity"]).collect()}
    assert got == {base[0], base[1]}


def test_city_filter_has_no_forced_broadcast(spark, built_index):
    """The allowed-doc set is unbounded (a common city term matches
    O(N) docs) — the plan must not carry an explicit broadcast hint;
    AQE picks the strategy at runtime."""
    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    eng.city_docs = make_city_docs(
        spark.createDataFrame([("https://example.org/42/0000001",)], "url string"))
    df = eng.search("world trade", 10, cities=["world"])
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


# ---------------------------------------------------------------------------
# TREC sink formatting

def test_trec_run_line_large_score_no_grouping(spark):
    from search_engine_spark.sources.sinks import trec_run_lines

    res = spark.createDataFrame(
        [("q1", 1, "doc9", 1234.5), ("q1", 2, "doc3", 42.385)],
        "qid string, rank int, url string, score double")
    lines = [r["line"] for r in trec_run_lines(res).collect()]
    assert lines == ["q1 Q0 doc9 1 1234.500000 mt", "q1 Q0 doc3 2 42.385000 mt"]


# ---------------------------------------------------------------------------
# streaming: replayed epochs must not duplicate postings

def test_stream_replay_is_idempotent(spark, tmp_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.fixtures import make_pages, pages_schema_arrow
    from search_engine_spark.indexer import IndexPaths
    from search_engine_spark.streaming.ingest import stream_ingest

    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
    pages = make_pages(60, seed=9)
    stream_dir = os.path.join(tmp_dir, "pages")
    os.makedirs(stream_dir)
    pq.write_table(pa.Table.from_pylist(pages, schema=pages_schema_arrow()),
                   os.path.join(stream_dir, "chunk0.parquet"))
    ix = os.path.join(tmp_dir, "ix")

    stream_ingest(spark, stream_dir, ix, cfg)
    paths = IndexPaths(ix)
    n1 = spark.read.parquet(paths.postings_raw).count()

    # simulate the crash-replay: drop the checkpoint so the SAME data
    # re-runs as epoch 0 again — the publish must overwrite, not append
    import shutil
    shutil.rmtree(os.path.join(ix, "_stream_checkpoint"))
    stream_ingest(spark, stream_dir, ix, cfg)
    n2 = spark.read.parquet(paths.postings_raw).count()
    assert n2 == n1, "replayed epoch duplicated postings"


# ---------------------------------------------------------------------------
# positions codec + phrase search

def test_positions_codec_roundtrip():
    from search_engine_spark.codec import decode_positions, encode_positions

    rng = np.random.default_rng(3)
    for _ in range(20):
        tfs = rng.integers(1, 9, size=rng.integers(1, 30))
        lists = [np.sort(rng.choice(2000, size=t, replace=False)) for t in tfs]
        flat = np.concatenate(lists)
        buf = encode_positions(flat, tfs)
        back = decode_positions(buf, tfs)
        assert back.tolist() == flat.tolist()
    assert encode_positions(np.array([], dtype=np.uint64), np.array([], dtype=np.int64)) == b""


def test_phrase_search_matches_python_reference(spark, tmp_dir):
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.fixtures import make_pages, pages_schema_arrow
    from search_engine_spark.indexer import build_index
    from search_engine_spark.searcher import SearchEngine
    from search_engine_spark.textproc import parse_doc

    import pyarrow as pa
    import pyarrow.parquet as pq

    pages = make_pages(150, seed=13)
    src = os.path.join(tmp_dir, "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=pages_schema_arrow()), src)
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2,
                       keep_positions=True)
    ix = os.path.join(tmp_dir, "ix")
    build_index(spark, spark.read.parquet(src), ix, cfg, resume=False)
    eng = SearchEngine(spark, ix, cfg)

    phrase = "world trade"
    got = [(r["url"], r["phrase_tf"]) for r in eng.phrase_search(phrase, 20).collect()]

    terms = eng.parse_phrase(phrase)
    stop = cfg.stop_set()
    ref = []
    for p in pages:
        posmap = {k.lower(): set(v.positions)
                  for k, v in parse_doc(p["text"], stop, cfg.stem).items()}
        base_sets = [{pos - off for pos in posmap.get(key, ())} for key, off in terms]
        bases = set.intersection(*base_sets) if all(base_sets) else set()
        if bases:
            ref.append((p["url"], len(bases)))
    ref.sort(key=lambda t: (-t[1], t[0]))
    assert got == ref[:20] and got, "phrase results must match the reference and be non-empty"

    # rule-rewritten phrase: "between 18 and 24" is indexed as ONE
    # term (N10) — parse_phrase must run the full rule kernel or this
    # silently returns empty (fixture snippets inject the construct)
    rule_terms = eng.parse_phrase("between 18 and 24")
    assert rule_terms == [("between 18 and 24", 0)]
    got_rule = [(r["url"], r["phrase_tf"]) for r in
                eng.phrase_search("between 18 and 24", 50).collect()]
    ref_rule = []
    for p in pages:
        posmap = {k.lower(): set(v.positions)
                  for k, v in parse_doc(p["text"], stop, cfg.stem).items()}
        hits = posmap.get("between 18 and 24", set())
        if hits:
            ref_rule.append((p["url"], len(hits)))
    ref_rule.sort(key=lambda t: (-t[1], t[0]))
    assert got_rule == ref_rule[:50] and got_rule, "rule phrase must match docs"

    # a phrase with an out-of-dictionary word -> empty
    assert eng.phrase_search("zzznope trade", 10).count() == 0

    # an index without positions refuses rather than silently failing
    cfg2 = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
    ix2 = os.path.join(tmp_dir, "ix2")
    build_index(spark, spark.read.parquet(src), ix2, cfg2, resume=False)
    with pytest.raises(ValueError):
        SearchEngine(spark, ix2, cfg2).phrase_search(phrase)


# ---------------------------------------------------------------------------
# lineage: the DataFrame view ignores stray tmp files

def test_lineage_df_ignores_tmp_files(spark, tmp_dir):
    from search_engine_spark.indexer import IndexPaths, lineage_df, read_lineage, write_lineage

    paths = IndexPaths(tmp_dir)
    write_lineage(paths, [{"stage": "tokenize", "key": "all"},
                          {"stage": "pack", "key": "0"}])
    stray = os.path.join(paths.lineage, "lineage-999.json.tmp")
    with open(stray, "w") as fh:
        fh.write('{"stage": "bogus", "key": "x"}\n')
    assert len(read_lineage(paths)) == 2
    assert lineage_df(spark, paths).count() == 2


def _clustered_embeddings(spark, n_clusters=8, per_cluster=40, dim=16):
    """Deterministic clustered vector set whose FIRST 8 ids all sit in
    cluster 0 — the seed-vector quantizer's worst case (all its
    centroids start inside one cluster), which trained k-means must
    escape.  Cluster means are scaled one-hot axes; members perturb
    the mean on two fixed extra axes (LCG-free, pure arithmetic)."""
    rows = []
    vid = 0
    # first 8 vectors: cluster 0 (the seeds), then round-robin
    order = [0] * 8 + [c for i in range(per_cluster - 8 + (n_clusters - 1) * per_cluster)
                       for c in [i % n_clusters]]
    counts = {c: 0 for c in range(n_clusters)}
    for c in order:
        if counts[c] >= per_cluster:
            continue
        j = counts[c]
        v = [0.0] * dim
        v[c] = 10.0
        v[(c + 1) % dim] = 1.0 + (j % 5) * 0.1   # within-cluster spread
        v[(c + 3) % dim] = 0.5 + (j % 3) * 0.1
        rows.append((vid, v))
        vid += 1
        counts[c] += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_trained_ivf_centroids_beat_seed_recall(spark):
    """train_ivf_centroids (deterministic integer-grid Lloyd's) must
    raise recall@10 over the seed-vector quantizer at the same nprobe
    on clustered data, and must be partitioning-independent."""
    emb = _clustered_embeddings(spark)
    ids_m = sorted((r["vec_id"], list(r["embedding"])) for r in emb.collect())
    m = np.array([v for _, v in ids_m])
    # query near cluster 5's mean
    qvec = [0.0] * 16
    qvec[5] = 10.0
    qvec[6] = 1.2
    exact = {r["vec_id"] for r in SIM.cosine_topk(emb, qvec, k=10).collect()}

    trained = SIM.train_ivf_centroids(emb, n_centroids=8, n_iters=4)
    seed_hits = {r["vec_id"] for r in
                 SIM.ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=2).collect()}
    trained_hits = {r["vec_id"] for r in
                    SIM.ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=2,
                                 cents=trained).collect()}
    seed_recall = len(seed_hits & exact) / 10
    trained_recall = len(trained_hits & exact) / 10
    assert trained_recall >= seed_recall
    assert trained_recall >= 0.9, (seed_recall, trained_recall)

    # partitioning independence: same cents from a different layout
    again = SIM.train_ivf_centroids(emb.repartition(7, "vec_id"),
                                    n_centroids=8, n_iters=4)
    assert np.array_equal(trained, again)


def test_related_terms_planted(spark):
    """Integer-Jaccard related terms on a planted co-occurrence
    corpus: 'alpha' always co-occurs with 'beta' (jaccard 1e6), half
    the time with 'gamma', never with 'delta'; hapax coincidences
    (min_co) are dropped."""
    from search_engine_spark.operators import textstats as TS

    rows = []
    for i in range(12):
        words = ["alpha", "beta"]
        if i % 2 == 0:
            words.append("gamma")
        rows.append((i, " ".join(words)))
    for i in range(12, 18):
        rows.append((i, "delta gamma"))
    rows.append((18, "alpha beta epsilon"))  # epsilon co-occurs once
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["term"], r["co_df"], r["jaccard_micro"], r["rank"])
           for r in TS.related_terms(docs, "alpha", k=10, min_co=2)
           .orderBy("rank").collect()]
    # df(alpha)=13, df(beta)=13, co=13 -> 1e6; gamma: co=6, df=12,
    # union=19 -> 315789; delta: co=0 (absent); epsilon: co=1 < min_co
    assert got == [("beta", 13, 1_000_000, 1),
                   ("gamma", 6, 315_789, 2)]
    assert TS.related_terms(docs, "nosuchterm").count() == 0
