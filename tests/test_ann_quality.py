"""Quality floors for the approximate-NN indexes (VERDICT r5 ask #6).

The parity rows prove both engines compute the same approximate
result; ann_recall_eval reports how good it is — but nothing FAILED if
an index change cratered usefulness (the oracle computes the same bad
number on both sides). These floors make a degraded index a red test.

Measured at sf0.01 (the driver's correctness scale):
pq_rerank = 0.9, ivf = 0.4.

- pq_rerank: the README claims the exact re-rank over the ADC
  shortlist keeps ~90% of the true top-5; floor at 0.8.
- ivf: n_probe=2 of k=8 lists scans ~25% of the corpus, so BLIND
  probing would land ~0.25 recall. The synthetic embeddings are
  near-isotropic (clusters barely separate directions), so 0.4 is the
  honest ceiling-ish value for this data — the floor at 0.3 asserts
  the learned lists genuinely beat random probing while tolerating
  testdata-regeneration noise. A collapsed clustering (everything in
  one list) or a broken Lloyd update reads at-or-below the blind
  level and trips it.

Run at sf0.01 explicitly: recall floors are data-scale statements
(sf0.001 has too few vectors per list for the numbers to be stable).
"""

from __future__ import annotations

from namegraph_collections_spark.queries import REGISTRY

SF01 = "/root/testdata/sf0.01"

FLOORS = {"pq_rerank": 0.8, "ivf": 0.3}


def test_ann_macro_recall_floors(spark):
    rows = (
        REGISTRY["ann_recall_eval"].fn(spark, SF01)
        .filter("q_id = -1")
        .collect()
    )
    got = {r["method"]: r["recall"] for r in rows}
    assert set(got) == set(FLOORS)
    for method, floor in FLOORS.items():
        assert got[method] >= floor, (
            f"{method} macro recall {got[method]} fell below {floor} — "
            "the index is no longer useful even if parity still matches"
        )
