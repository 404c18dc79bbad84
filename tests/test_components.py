"""connected_components (stages/dedup.py) — min-label propagation over
near-dup pair tables.

The reference keeps at most pairwise dedup decisions (its crawl cache is
URL-keyed); corpus-level keep-one dedup needs the transitive closure of the
pair relation, which is what a training-data pipeline actually deletes by.
Tests: known graphs (chain exercises multi-round propagation), duplicate /
reversed edges, convergence inside max_iters, and the end-to-end
keep-one survivor set over a planted near-dup corpus.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_ray.stages.dedup import connected_components, keep_one_survivors


def _pairs(edges):
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], type=pa.int64()),
                "id_b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
    )


def _components(result) -> dict[int, int]:
    rows = result.take_all()
    return {r["doc_id"]: r["component_id"] for r in rows}


@pytest.mark.parametrize("regime", [{}, {"driver_threshold": 0}])
def test_two_components_and_chain(ray_session, regime):
    # chain 1-2-3-4 needs label propagation across rounds; (10,11) is a
    # separate component; node 20 never appears in a pair -> absent.
    # Both size-adaptive regimes must agree: driver union-find (default at
    # this size) and distributed label propagation (forced via threshold=0).
    comp = _components(
        connected_components(_pairs([(1, 2), (2, 3), (3, 4), (10, 11)]), **regime)
    )
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(ray_session):
    # diameter >> 2 exercises the iterate-until-flat loop; min-label
    # propagation moves one hop per round, so max_iters must cover the
    # diameter (documented pathology bound in the docstring)
    n = 24
    comp = _components(
        connected_components(
            _pairs([(i, i + 1) for i in range(n)]),
            max_iters=n + 2, driver_threshold=0,
        )
    )
    assert comp == {i: 0 for i in range(n + 1)}


@pytest.mark.parametrize("regime", [{}, {"driver_threshold": 0}])
def test_duplicate_and_unordered_edges(ray_session, regime):
    comp = _components(
        connected_components(_pairs([(5, 3), (3, 5), (5, 3), (3, 9), (9, 3)]), **regime)
    )
    assert comp == {3: 3, 5: 3, 9: 3}


def test_chain_diameter_100_converges_in_default_iters(ray_session):
    # the round-4 scale bug: label propagation needed diameter-many rounds,
    # so any chain with diameter > max_iters under-merged.  Star contraction
    # needs ~log(diameter) rounds: a 100-diameter chain must produce EXACT
    # components well inside the default max_iters, in the distributed
    # regime (driver_threshold=0 forces it).
    n = 100
    comp = _components(
        connected_components(
            _pairs([(i, i + 1) for i in range(n)]), driver_threshold=0
        )
    )
    assert comp == {i: 0 for i in range(n + 1)}


def test_max_iters_bounds_work(ray_session):
    # with max_iters=1 a long chain must still return SOME labeling with
    # every node present (bounded pathology, not a hang) — distributed
    # regime only (the driver union-find has no iteration bound)
    res = connected_components(
        _pairs([(i, i + 1) for i in range(10)]), max_iters=1, driver_threshold=0
    )
    comp = _components(res)
    assert set(comp) == set(range(11))


@pytest.mark.parametrize("regime", [{}, {"broadcast_threshold": 0}])
def test_keep_one_survivors_end_to_end(ray_session, regime):
    # planted corpus: docs 0..9; {0,1,2} dups, {5,6} dups -> survivors keep
    # the min id of each component plus all untouched docs.  Both removal
    # regimes must agree: broadcast is_in filter (default at this size) and
    # the tagged-union groupby anti-join (forced via threshold=0).
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(10)), type=pa.int64())})
    )
    pairs = _pairs([(0, 1), (1, 2), (5, 6)])
    kept = sorted(
        r["doc_id"] for r in keep_one_survivors(docs, pairs, **regime).take_all()
    )
    assert kept == [0, 3, 4, 5, 7, 8, 9]


def test_keep_one_no_pairs_is_identity(ray_session):
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([7, 8, 9], type=pa.int64())})
    )
    kept = sorted(r["doc_id"] for r in keep_one_survivors(docs, _pairs([])).take_all())
    assert kept == [7, 8, 9]


def test_unconverged_label_propagation_warns(ray_session, caplog):
    """Round-4 ADVICE: exhausting max_iters without a confirm round must
    log a loud warning — under-merged component ids are silently wrong
    otherwise.  (Bounded-pathology RETURN stays the contract.)"""
    import logging

    with caplog.at_level(logging.WARNING, logger="crawl4ai_ray.stages.dedup"):
        res = connected_components(
            _pairs([(i, i + 1) for i in range(10)]), max_iters=1,
            driver_threshold=0,
        )
        res.materialize()
    assert any("did NOT converge" in r.message for r in caplog.records)
