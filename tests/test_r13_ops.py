"""r13 operator edge-case tests, on crafted fixtures plus pure-Python
replications.

llm_html_extract is pinned on hand-built documents covering every
branch of the boilerplate classifier (kept content, short block, empty
text, exact 25-char boundary, link-dense long block) with hand-computed
md5s; llm_wordpiece_learn on a corpus whose likelihood argmax DIFFERS
from the count argmax every round (proving it is WordPiece, not BPE)
with a hand-computed merge trajectory, plus a pure-Python learner
replication; llm_policy_kl_audit against a pure-Python JM/KN scorer;
mm_audio_vad_plan against a pure-Python frame/segment replication and a
one-hash-exchange plan assertion; dbt_clone_ci's zero-copy claim is
checked STRUCTURALLY (the clone root holds no data files).
"""

from __future__ import annotations

import hashlib
import math
import os

import pytest

from dbt_local_duckdb_deltalake_project_spark.catalog import TABLES
from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE, QUERIES


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _mk_docs_dir(tmp_path_factory, sf_dir, spark, name, docs):
    d = tmp_path_factory.mktemp(name)
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        (doc_id, text, "en", "crafted", len(text)) for doc_id, text in docs
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _duck_for(crafted_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{crafted_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark writes directory tables
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


# ---------------------------------------------------------------------------
# llm_html_extract
# ---------------------------------------------------------------------------

_HTML_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta"),  # 35 chars: kept
    (1, "tiny"),  # < 25 chars: dropped
    (2, ""),  # empty content block: dropped
    (3, "aaaa bbbb cccc dddd eeeee"),  # exactly 25: kept (>= boundary)
    # link-dense long block: clean = 49 chars but 18 anchor chars
    # -> 18e6 // 49 = 367346 ppm >= 300000 -> dropped
    (4, "<a>click here</a> <a>and here</a> plus surrounding words enough"),
]

# doc_id -> (n_blocks, n_kept, kept_chars, extracted)
_HTML_EXPECTED = {
    0: (4, 1, 35, "alpha beta gamma delta epsilon zeta"),
    1: (4, 0, 0, ""),
    2: (4, 0, 0, ""),
    3: (4, 1, 25, "aaaa bbbb cccc dddd eeeee"),
    4: (4, 0, 0, ""),
}


@pytest.fixture(scope="module")
def html_dir(tmp_path_factory, sf_dir, spark):
    return _mk_docs_dir(
        tmp_path_factory, sf_dir, spark, "crafted_html", _HTML_DOCS
    )


def test_html_extract_hand_table(spark, html_dir):
    got = {
        r["doc_id"]: (
            r["n_blocks"],
            r["n_kept"],
            r["kept_chars"],
            r["extracted_md5"],
        )
        for r in QUERIES["llm_html_extract"](spark, html_dir).collect()
    }
    want = {
        i: (nb, nk, kc, _md5(text))
        for i, (nb, nk, kc, text) in _HTML_EXPECTED.items()
    }
    assert got == want


def test_html_extract_oracle_matches_hand(html_dir):
    con = _duck_for(html_dir)
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(ORACLE["llm_html_extract"]).fetchall()
    }
    want = {
        i: (nb, nk, kc, _md5(text))
        for i, (nb, nk, kc, text) in _HTML_EXPECTED.items()
    }
    assert got == want


# ---------------------------------------------------------------------------
# llm_wordpiece_learn
# ---------------------------------------------------------------------------

# doc_ids must satisfy the op's % 10 == 1 sample. Likelihood argmax
# diverges from count argmax in round 1: counts a:4 b:2 x:1 y:1; pairs
# (a,a):2 score .125, (a,b):2 score .25, (x,y):1 score 1.0 -> WordPiece
# adopts the RARE-unigram pair (x,y); BPE would adopt (a,a).
_WP_DOCS = [(1, "aab"), (11, "aab"), (21, "xy")]

_WP_EXPECTED = [
    (1, "x", "y", 1, 10**12, 1, 7),
    (2, "a", "b", 2, 250 * 10**9, 2, 5),
    (3, "a", "ab", 2, 500 * 10**9, 2, 3),
    # round 4 has no pairs left: both engines stop at 3 rows
]


def _wp_brute(texts, n_rounds=6):
    """Independent pure-Python WordPiece learner (greedy left-to-right
    merge = the operator's parity-islands relational form)."""
    docs = [list(t[:64]) for t in texts if len(t) >= 1]
    rows = []
    for i in range(1, n_rounds + 1):
        cu: dict[str, int] = {}
        for d in docs:
            for tok in d:
                cu[tok] = cu.get(tok, 0) + 1
        pc: dict[tuple[str, str], int] = {}
        for d in docs:
            for p in range(len(d) - 1):
                pc[(d[p], d[p + 1])] = pc.get((d[p], d[p + 1]), 0) + 1
        if not pc:
            break

        def score(ab):
            return (pc[ab] * 10**12) // (cu[ab[0]] * cu[ab[1]])

        best = min(pc, key=lambda ab: (-score(ab), ab[0], ab[1]))
        nm = 0
        newdocs = []
        for d in docs:
            out, p = [], 0
            while p < len(d):
                if (
                    p + 1 < len(d)
                    and d[p] == best[0]
                    and d[p + 1] == best[1]
                ):
                    out.append(d[p] + d[p + 1])
                    nm += 1
                    p += 2
                else:
                    out.append(d[p])
                    p += 1
            newdocs.append(out)
        docs = newdocs
        rows.append(
            (
                i,
                best[0],
                best[1],
                pc[best],
                score(best),
                nm,
                sum(len(d) for d in docs),
            )
        )
    return rows


def test_wp_expected_matches_brute_force():
    assert _wp_brute([t for _, t in _WP_DOCS]) == _WP_EXPECTED


@pytest.fixture(scope="module")
def wp_dir(tmp_path_factory, sf_dir, spark):
    return _mk_docs_dir(
        tmp_path_factory, sf_dir, spark, "crafted_wp", _WP_DOCS
    )


def test_wordpiece_hand_trajectory(spark, wp_dir):
    got = [
        tuple(r)
        for r in QUERIES["llm_wordpiece_learn"](spark, wp_dir).collect()
    ]
    assert got == _WP_EXPECTED


def test_wordpiece_oracle_matches_hand(wp_dir):
    con = _duck_for(wp_dir)
    got = [
        tuple(r)
        for r in con.execute(ORACLE["llm_wordpiece_learn"]).fetchall()
    ]
    assert got == _WP_EXPECTED


def test_wordpiece_brute_matches_engines_on_fixture(spark, sf_dir):
    # the replication against the real (tiny-SF) fixture sample
    import duckdb

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            "SELECT text FROM "
            f"read_parquet('{sf_dir}/documents.parquet') "
            "WHERE doc_id % 10 = 1 ORDER BY doc_id"
        ).fetchall()
    ]
    want = _wp_brute(texts)
    got = [
        tuple(r)
        for r in QUERIES["llm_wordpiece_learn"](spark, sf_dir).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# llm_policy_kl_audit
# ---------------------------------------------------------------------------

_KL_DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the cat food"),
    (2, "dog dog dog"),
    (3, "solo"),  # no bigrams: absent from the output
]


def _lnq(x: int) -> int:
    return math.floor(round(math.log(x), 9) * 1_000_000 + 0.5)


def _kl_brute(docs):
    occ = []
    for i, text in docs:
        ws = [w for w in text.split(" ") if w != ""]
        occ += [(i, ws[p], ws[p + 1]) for p in range(len(ws) - 1)]
    pc: dict[tuple[str, str], int] = {}
    for _, v, w2 in occ:
        pc[(v, w2)] = pc.get((v, w2), 0) + 1
    c_v: dict[str, int] = {}
    n1l: dict[str, int] = {}
    c_w: dict[str, int] = {}
    n1r: dict[str, int] = {}
    for (v, w2), c in pc.items():
        c_v[v] = c_v.get(v, 0) + c
        n1l[v] = n1l.get(v, 0) + 1
        c_w[w2] = c_w.get(w2, 0) + c
        n1r[w2] = n1r.get(w2, 0) + 1
    n = sum(pc.values())
    t_ = len(pc)
    out: dict[int, list[int]] = {}
    for i, v, w2 in occ:
        c = pc[(v, w2)]
        klt = (
            _lnq(3 * c * n + c_w[w2] * c_v[v])
            - _lnq(4 * c_v[v] * n)
            - _lnq((4 * c - 3) * t_ + 3 * n1l[v] * n1r[w2])
            + _lnq(4 * c_v[v] * t_)
        )
        out.setdefault(i, []).append(klt)
    return {i: (len(ks), sum(ks)) for i, ks in out.items()}


@pytest.fixture(scope="module")
def kl_dir(tmp_path_factory, sf_dir, spark):
    return _mk_docs_dir(
        tmp_path_factory, sf_dir, spark, "crafted_kl", _KL_DOCS
    )


def test_policy_kl_brute_vs_both_engines(spark, kl_dir):
    want = _kl_brute(_KL_DOCS)
    got = {
        r["doc_id"]: (r["n_terms"], r["kl_micros"])
        for r in QUERIES["llm_policy_kl_audit"](spark, kl_dir).collect()
    }
    assert got == want
    con = _duck_for(kl_dir)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(ORACLE["llm_policy_kl_audit"]).fetchall()
    }
    assert duck == want


# ---------------------------------------------------------------------------
# mm_audio_vad_plan
# ---------------------------------------------------------------------------


def _vad_brute(docs):
    rows = []
    for doc_id, text in docs:
        if doc_id % 3 != 1:
            continue
        duration_ms = len(text.encode()) * 7
        voiced = [
            f
            for f in range(duration_ms // 20)
            if (doc_id * 37 + f * f * 13 + f * 29) % 1000 >= 550
        ]
        segs: list[list[int]] = []
        for f in voiced:
            if segs and f - segs[-1][-1] <= 3:
                segs[-1].append(f)
            else:
                segs.append([f])
        for sid, s in enumerate(segs, 1):
            rows.append(
                (
                    doc_id,
                    duration_ms,
                    sid,
                    s[0] * 20,
                    (s[-1] + 1) * 20,
                    len(s),
                    s[-1] - s[0] + 1,
                )
            )
    return rows


def test_vad_brute_matches_spark_on_fixture(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    want = _vad_brute(docs)
    got = [
        tuple(r)
        for r in QUERIES["mm_audio_vad_plan"](spark, sf_dir).collect()
    ]
    assert got == want


def test_vad_plan_single_hash_exchange(spark, sf_dir):
    # the LAG window, the running sum, and the (media_id, seg_id)
    # rollup must all ride ONE media_id hash shuffle (the rollup keys
    # are a superset, so Catalyst reuses the exchange); only the
    # presentation orderBy may add a range shuffle.
    df = QUERIES["mm_audio_vad_plan"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# dbt_clone_ci
# ---------------------------------------------------------------------------


def test_clone_ci_zero_copy_and_isolation(spark, sf_dir):
    from dbt_local_duckdb_deltalake_project_spark.sources.workspace import (
        WORK_ROOT,
    )

    out = {
        r["model"]: r for r in QUERIES["dbt_clone_ci"](spark, sf_dir).collect()
    }
    assert all(r["prod_untouched"] for r in out.values())
    assert out["bronze_orders"]["action"] == "clone"
    assert not out["bronze_orders"]["selected"]
    assert out["silver_orders"]["action"] == "build"
    assert out["gold_revenue"]["action"] == "build"

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    ci_bronze = os.path.join(WORK_ROOT, sf_name, "dbt_clone_ci_ci",
                             "bronze_orders")
    # ZERO-COPY: the clone root holds only the _delta_log (its first
    # commit re-adds source files by absolute path — no data copied)
    assert sorted(os.listdir(ci_bronze)) == ["_delta_log"]

    # the CI silver (v2: drops open orders) must be a strict subset of
    # prod silver (v1) — proves CI really ran the edited definition
    from dbt_local_duckdb_deltalake_project_spark.sources.deltalike import (
        DeltaLikeTable,
    )

    prod_silver = DeltaLikeTable(
        os.path.join(WORK_ROOT, sf_name, "dbt_clone_ci_prod",
                     "silver_orders")
    ).read(spark)
    assert prod_silver.count() > out["silver_orders"]["n_rows"]
