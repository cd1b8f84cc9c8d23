"""ANN quality checks: the approximate similarity-search variants must
return genuinely near neighbors, not just well-formed rows. Each variant
is compared against the exact cosine top-k computed in numpy on the same
fixture (recall@k), and every reported cosine must equal the exact value
for that vec_id — approximation may drop neighbors, never mis-score them.
"""

from __future__ import annotations

import numpy as np
import pytest

from dbt_local_duckdb_deltalake_project_spark.catalog import t
from dbt_local_duckdb_deltalake_project_spark.operators import QUERIES

K = 10


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    pdf = t(spark, sf_dir, "embeddings").toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    q = m[ids == 0][0]
    cand, cids = m[ids != 0], ids[ids != 0]
    cos = (cand @ q) / (
        np.linalg.norm(cand, axis=1) * np.linalg.norm(q)
    )
    order = np.argsort(-cos)
    return {
        "by_id": dict(zip(cids.tolist(), cos.tolist())),
        "topk": set(cids[order[:K]].tolist()),
    }


@pytest.mark.parametrize(
    "qid,min_recall",
    [
        ("llm_cosine_topk_blocked", 1.0),  # brute force: exact
        ("llm_cosine_topk_lsh", 0.3),  # one bucket of 16 probed
        ("llm_cosine_topk_ivf", 0.3),  # 2 of 8 cells probed
    ],
)
def test_ann_recall_and_scores(spark, sf_dir, exact, qid, min_recall):
    rows = QUERIES[qid](spark, sf_dir).collect()
    assert 0 < len(rows) <= K
    got = [r["vec_id"] for r in rows]
    # scores must be exact cosines for the ids returned
    for r in rows:
        assert r["cosine"] == pytest.approx(
            exact["by_id"][r["vec_id"]], abs=1e-5
        )
    # results sorted by descending cosine
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    recall = len(set(got) & exact["topk"]) / K
    assert recall >= min_recall, f"{qid} recall {recall}"
