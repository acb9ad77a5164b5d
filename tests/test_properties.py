"""Property-based tests (hypothesis) for the invariants the engine's
correctness story rests on: the iterative closure against a Python
DFS oracle on random graphs, permutation-invariance of the
order-sensitive aggregations (the determinism claim of SURVEY §4
item 3), snapshot-diff algebra, and UDF idempotence.

Spark round-trips are expensive, so graph/row sizes stay small and
example counts low — breadth comes from hypothesis' shrinking, not
volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from namegraph_collections_spark.functions.normalize import try_force_normalize
from namegraph_collections_spark.functions.tokenize import dictionary_split

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

nodes = st.integers(min_value=0, max_value=9)
edge_sets = st.sets(st.tuples(nodes, nodes), min_size=1, max_size=20)


def _dfs_closure(edges: set[tuple[int, int]]) -> set[tuple[int, int]]:
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out = set()
    for start in {s for s, _ in edges}:
        seen: set[int] = set()
        stack = list(adj.get(start, ()))
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        out |= {(start, t) for t in seen}
    return out


def _union_find(edges: set[tuple[int, int]], vertices: set[int]) -> dict[int, int]:
    parent = {v: v for v in vertices}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in vertices}


@settings(**_SETTINGS)
@given(edge_sets)
def test_connected_components_match_union_find(spark, edges):
    """large-star/small-star == union-find on arbitrary undirected
    graphs (self-loops, cycles, isolated vertices) — the cluster
    closure behind neardup_clusters."""
    from namegraph_collections_spark.operators.components import connected_components

    vertices = {n for e in edges for n in e} | {99}  # 99: always-isolated vertex
    edf = spark.createDataFrame(list(edges), "src int, dst int")
    vdf = spark.createDataFrame([(v,) for v in vertices], "node int")
    got = {
        (r["node"], r["component"])
        for r in connected_components(edf, vertices=vdf).collect()
    }
    want = set(_union_find(edges, vertices).items())
    assert got == want


@settings(**_SETTINGS)
@given(edge_sets)
def test_closure_matches_dfs_oracle(spark, edges):
    """transitive_closure == DFS reachability on arbitrary digraphs
    (incl. cycles and self-loops) — the J14 ★ correctness property."""
    from namegraph_collections_spark.operators.closure import transitive_closure

    df = spark.createDataFrame(
        [(f"n{s}", f"n{d}") for s, d in edges], "src string, dst string"
    )
    got = {(r["src"], r["dst"]) for r in transitive_closure(df).collect()}
    want = {(f"n{s}", f"n{d}") for s, d in _dfs_closure(edges)}
    assert got == want


@settings(**_SETTINGS)
@given(st.permutations(list(range(6))))
def test_merge_groups_order_invariant(spark, perm):
    """merge_groups must give identical results for any input row
    order — the engine's deterministic replacement for the reference's
    file-order reduce (SURVEY §4 item 3)."""
    from pyspark.sql import functions as F

    from namegraph_collections_spark.plans.letter_merge import merge_groups
    from tests.test_pipeline import _MINI_SCHEMA, _mini_collection

    base = [
        _mini_collection(f"Q{i + 1}", "Same", rank=i * 10, members=[(f"m{i % 3}", i)])
        for i in range(6)
    ]
    rows = [base[i] for i in perm]
    df = spark.createDataFrame(rows, _MINI_SCHEMA).withColumn("merge_key", F.lit("Same"))
    out = merge_groups(df, "merge_key").collect()
    assert len(out) == 1
    r = out[0].asDict(recursive=True)
    assert r["item"] == "Q1"  # min qid regardless of order
    assert r["rank"] == 50
    assert [m["curated"] for m in r["members"]] == ["m2", "m1", "m0"]  # rank desc


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdef"), st.integers(0, 3)), min_size=0, max_size=8
    )
)
def test_snapshot_diff_algebra(spark, rows):
    """diff(x, x) is all-noop; diff(empty, x) is all-create."""
    from namegraph_collections_spark.operators.cdc import snapshot_diff

    data = [(k, v) for k, v in {k: v for k, v in rows}.items()]
    x = spark.createDataFrame(data, "id string, v int") if data else spark.createDataFrame(
        [], "id string, v int"
    )
    same = {r["op"] for r in snapshot_diff(x, x, "id", ["v"]).collect()}
    assert same <= {"noop"}
    empty = spark.createDataFrame([], "id string, v int")
    creates = {r["op"] for r in snapshot_diff(empty, x, "id", ["v"]).collect()}
    assert creates <= {"create"}


@given(st.text(min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_force_normalize_idempotent(s):
    once = try_force_normalize(s)
    if once is not None:
        assert try_force_normalize(once) == once


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_dictionary_split_covers_input(s):
    """Tokenizer splits must concatenate back to the input chunk."""
    assert "".join(dictionary_split(s)) == s


# --- S4: sqldump DFA round-trip (pure Python, no Spark session) ------------
_sql_text = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", min_codepoint=32, max_codepoint=0x2FFF),
    max_size=30,
)
_sql_field = st.one_of(st.integers(-10**9, 10**9), _sql_text)
_sql_tuples = st.lists(st.lists(_sql_field, min_size=1, max_size=6), min_size=1, max_size=5)


def _render_insert(tuples):
    """MySQL-dump escaping: strings quoted with ', backslash escapes
    for backslash and quote (the grammar sql_parser.c implements)."""

    def field(v):
        if isinstance(v, int):
            return str(v)
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

    body = ",".join("(" + ",".join(field(v) for v in tup) + ")" for tup in tuples)
    return f"INSERT INTO `t` VALUES {body};"


@given(_sql_tuples)
@settings(max_examples=200, deadline=None)
def test_sqldump_dfa_roundtrip(tuples):
    """Every tuple rendered with MySQL escaping parses back verbatim —
    same-width tuples only, matching the renderer's single-table
    contract (the C parser's too)."""
    from namegraph_collections_spark.sources.sqldump import split_insert_tuples

    # the renderer emits one INSERT for a single table: normalize all
    # tuples to the first tuple's width (dumps are rectangular)
    width = len(tuples[0])
    tuples = [t[:width] + [0] * (width - len(t)) for t in tuples]
    line = _render_insert(tuples)
    parsed = list(split_insert_tuples(line))
    want = [[str(v) for v in tup] for tup in tuples]
    assert parsed == want


def test_embedding_arrays_are_dim_wide(spark):
    """similarity._dot folds the WHOLE array while the SQL oracles sum
    exactly DIM terms; the two agree only because every embedding is
    exactly DIM elements wide. Pin that invariant at every committed
    scale factor so a changed fixture cannot silently diverge."""
    from pyspark.sql import functions as F

    from namegraph_collections_spark.queries.similarity import DIM

    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        off = emb.filter(F.size("embedding") != DIM).count()
        assert off == 0, f"{sf}: {off} embeddings not {DIM}-wide"


def test_cms_never_undercounts(spark):
    """The count-min one-sided-error invariant: every reported
    estimate >= the exact count (min over D rows of sums that each
    include the token's own occurrences)."""
    from namegraph_collections_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    df = REGISTRY["cms_heavy_hitters"].fn(spark, "/root/testdata/sf0.001")
    assert df.filter(F.col("overcount") < 0).count() == 0
    # and the fixture exercises real collisions, not a vacuous sketch
    assert df.filter(F.col("overcount") > 0).count() > 0


SF = "/root/testdata/sf0.001"


def test_histogram_quantiles_are_monotone(spark):
    """p50 <= p90 <= p99 bucket estimates, and every cumulative rank
    target is within the row count — the structural invariants of the
    fixed-grid quantile probe."""
    from namegraph_collections_spark.queries import REGISTRY

    rows = {r["quantile"]: r for r in REGISTRY["histogram_quantiles"].fn(spark, SF).collect()}
    assert set(rows) == {"p50", "p90", "p99"}
    assert rows["p50"]["bucket"] <= rows["p90"]["bucket"] <= rows["p99"]["bucket"]
    for r in rows.values():
        assert r["est_hi"] == r["est_lo"] + 100
        assert r["n_rows"] > 0


def test_bpe_merges_are_structurally_valid(spark):
    """Each merge round's merged symbol is the concatenation of its
    pair, counts are positive, and rounds are 1..N exactly once."""
    from namegraph_collections_spark.queries import REGISTRY
    from namegraph_collections_spark.queries.bpe import BPE_ROUNDS

    rows = REGISTRY["bpe_merge_table"].fn(spark, SF).collect()
    assert sorted(r["round"] for r in rows) == list(range(1, BPE_ROUNDS + 1))
    for r in rows:
        assert r["merged"] == r["a"] + r["b"]
        assert r["cnt"] > 0


def test_deterministic_split_ratios(spark):
    """The content-addressed split lands near 80/10/10 (binomial
    tolerance at 500 docs) and every document is assigned exactly
    once."""
    from namegraph_collections_spark.queries import REGISTRY

    rows = REGISTRY["deterministic_split"].fn(spark, SF).collect()
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["split"]] = totals.get(r["split"], 0) + r["n_docs"]
    n = sum(totals.values())
    assert n == 500
    assert 0.7 <= totals["train"] / n <= 0.9
    assert 0.04 <= totals["val"] / n <= 0.18
    assert 0.04 <= totals["test"] / n <= 0.18


def test_incremental_dedup_candidates_subset_of_full_lsh(spark):
    """Every incremental (new x old) candidate must also be a
    candidate of the full all-pairs LSH run on the same corpus — the
    incremental index lookup can only ever see a subset of the
    all-pairs band collisions."""
    from namegraph_collections_spark.queries import REGISTRY

    inc = {
        (min(r["new_doc"], r["old_doc"]), max(r["new_doc"], r["old_doc"]))
        for r in REGISTRY["incremental_minhash_dedup"].fn(spark, SF).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["minhash_lsh_candidates"].fn(spark, SF).collect()
    }
    assert inc <= full


def test_tfidf_cosine_bounded(spark):
    """Conservative-norm cosine must stay in (0, 1]."""
    from namegraph_collections_spark.queries import REGISTRY

    for r in REGISTRY["tfidf_cosine_pairs"].fn(spark, SF).collect():
        assert 0.0 < r["cosine"] <= 1.000001


# ---------------------------------------------------------------------------
# repetition_signals: closed-form values on handcrafted documents
# ---------------------------------------------------------------------------
def test_repetition_closed_form_on_pure_alternation(spark):
    """doc_id=1 triggers none of the synthetic tail clauses, so the
    metrics are computable by hand: for text 'x y x y x y x y'
    (8 words, 8 chars), the most frequent bigram 'x y' occurs 4 times
    covering 4*2 = 8 chars → top2 coverage is exactly 1.0; every
    distinct 5-gram and 8-gram recurs or not in closed form."""
    from namegraph_collections_spark.queries.quality_signals import (
        repetition_signals_of,
    )

    docs = spark.createDataFrame(
        [(1, "x y x y x y x y")], "doc_id long, text string"
    )
    r = repetition_signals_of(docs).collect()[0]
    assert r.total_chars == 8
    assert r.top2_micro == 1_000_000  # 'x y' ×4 → 8/8 chars
    # 3-grams: 'x y x' ×3 (3 chars each) and 'y x y' ×3 → max 9/8
    assert r.top3_micro == 1_125_000
    # 5-grams: 'x y x y x' ×2, 'y x y x y' ×2, 5 word-chars each →
    # dup chars 2*5 + 2*5 = 20 over 8 total (overlap can exceed 1.0)
    assert r.dup5_micro == 2_500_000
    # 8-grams: exactly one ('x y x y x y x y'), count 1 → no dup
    assert r.dup8_micro == 0
    assert not r.rep_keep  # top2 1.0 > 0.20 threshold


def test_repetition_all_distinct_words_have_no_dups(spark):
    """A document of all-distinct words (doc_id=1: no tail) has zero
    duplicated n-grams and top-n coverage = n_chars(gram)/total."""
    from namegraph_collections_spark.queries.quality_signals import (
        repetition_signals_of,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    r = repetition_signals_of(docs).collect()[0]
    assert r.dup5_micro == 0 and r.dup8_micro == 0
    total = sum(len(w) for w in "alpha beta gamma delta epsilon zeta eta theta".split())
    assert r.total_chars == total
    # every bigram unique → top2 = max pair char length / total
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    best2 = max(len(a) + len(b) for a, b in zip(words, words[1:]))
    assert r.top2_micro == round(best2 * 1_000_000 / total)


# ---------------------------------------------------------------------------
# Domain-gate family invariants (round 8): the rollup, the gate
# application, the LID eval, and the cluster stats must all conserve
# the corpus — every document is counted exactly once, and every
# derived flag/ratio is consistent with its inputs.
# ---------------------------------------------------------------------------


def test_host_rollup_conserves_the_corpus(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY

    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = REGISTRY["host_quality_rollup"].fn(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_corpus
    for r in rows:
        assert 1 <= r.n_pages <= r.n_docs
        assert 0 <= r.n_keep <= r.n_docs
        assert 0 <= r.keep_rate_micro <= 1_000_000
        assert 0 <= r.dup_rate_micro < 1_000_000
        # the gate is exactly its published predicate
        assert r.domain_keep == (r.keep_rate_micro >= 250_000 and r.n_docs >= 10)


def test_domain_gate_application_is_the_conjunction(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY

    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = REGISTRY["domain_gated_corpus"].fn(spark, sf_dir).collect()
    assert len(rows) == n_corpus  # inner join drops nothing: every domain has a gate row
    for r in rows:
        assert r.final_keep == (r.domain_keep and r.doc_keep and r.url_keep)


def test_language_id_eval_partitions_the_corpus(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY

    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = REGISTRY["language_id_eval"].fn(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_corpus  # each doc in exactly one cell
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label_lang, []).append(r)
    for label, cells in by_label.items():
        total = cells[0].label_total
        assert all(c.label_total == total for c in cells)
        assert sum(c.n_docs for c in cells) == total
        for c in cells:
            assert c.share_micro == (c.n_docs * 1_000_000 + total // 2) // total


def test_dedup_cluster_stats_conserve_docs_and_removals(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY

    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = REGISTRY["dedup_cluster_stats"].fn(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_corpus  # every doc is in exactly one cluster
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.n_removable == r.n_docs - r.n_clusters


# ---------------------------------------------------------------------------
# Round-9 operators: DSIR, CCNet bucketing, duplicated spans.
# ---------------------------------------------------------------------------


def test_dsir_selection_is_the_documented_predicate(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY
    from namegraph_collections_spark.queries.data_selection import (
        DSIR_TARGET_SRCS,
    )

    docs = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = REGISTRY["dsir_importance_weights"].fn(spark, sf_dir).collect()
    assert len(rows) == len(docs)  # every doc scored exactly once
    for r in rows:
        assert r.is_target == (docs[r.doc_id] in DSIR_TARGET_SRCS)
        assert r.selected == ((not r.is_target) and r.weight_micro >= 0)
        assert r.n_grams >= 1  # unigrams alone guarantee >= 1


def test_dsir_gram_count_is_2n_minus_1(spark, sf_dir):
    """A document of n words contributes n unigrams + (n-1) bigrams."""
    from namegraph_collections_spark.queries import REGISTRY

    n_words = {
        r.doc_id: len([w for w in r.text.replace("\n", " ").split(" ") if w])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in REGISTRY["dsir_importance_weights"].fn(spark, sf_dir).collect():
        n = n_words[r.doc_id]
        assert r.n_grams == (2 * n - 1 if n >= 1 else 0)


def test_ccnet_buckets_are_ordered_terciles(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY

    rows = REGISTRY["ccnet_ppl_buckets"].fn(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = rs[0].lang_n
        assert len(rs) == n and all(r.lang_n == n for r in rs)
        rs.sort(key=lambda r: (r.nll_micro, r.doc_id))
        # ranks are exactly 1..n in that total order
        assert [r.rnk for r in rs] == list(range(1, n + 1))
        # bucket sizes follow the integer tercile rule, and the bucket
        # sequence along the total order is head* middle* tail*
        buckets = [r.bucket for r in rs]
        n_head = sum(b == "head" for b in buckets)
        n_mid = sum(b == "middle" for b in buckets)
        assert n_head == n // 3
        assert n_head + n_mid == (2 * n) // 3
        assert buckets == (
            ["head"] * n_head + ["middle"] * n_mid
            + ["tail"] * (n - n_head - n_mid)
        )


def test_dup_spans_are_maximal_and_disjoint(spark, sf_dir):
    from namegraph_collections_spark.queries import REGISTRY
    from namegraph_collections_spark.queries.span_dedup import SPAN_K

    rows = REGISTRY["dup_span_extract"].fn(spark, sf_dir).collect()
    assert rows  # the synthetic corpus repeats template phrases
    by_doc = {}
    for r in rows:
        assert r.end_word - r.start_word + 1 == r.span_words
        assert r.span_words >= SPAN_K
        assert 1 <= r.n_shingles <= r.span_words - SPAN_K + 1
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r.start_word)
        for a, b in zip(spans, spans[1:]):
            # maximality: merged spans can't touch or overlap — the
            # next duplicated shingle start is > K after the previous
            assert b.start_word > a.end_word + 1


def test_dup_spans_flag_a_planted_duplicate(spark):
    """Two handcrafted docs sharing an 8-word prefix (and nothing
    else duplicated) produce exactly one span per doc covering words
    1..8."""
    from namegraph_collections_spark.queries.span_dedup import SPAN_K
    from namegraph_collections_spark.queries import REGISTRY
    import os
    import tempfile

    shared = " ".join(f"tok{i}" for i in range(SPAN_K))
    docs = spark.createDataFrame(
        [
            (1, shared + " aaa bbb ccc", "en", "src0", 1),
            (2, shared + " ddd eee fff", "en", "src1", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
        rows = sorted(
            REGISTRY["dup_span_extract"].fn(spark, td).collect(),
            key=lambda r: r.doc_id,
        )
    assert [(r.doc_id, r.start_word, r.end_word) for r in rows] == [
        (1, 1, SPAN_K),
        (2, 1, SPAN_K),
    ]
