import numpy as np
import pytest

from whisperseg_tpu.consolidation import (
    _dbscan,
    consolidate_by_clustering,
    consolidate_by_voting,
    merge_window_boundaries,
)
from whisperseg_tpu.scoring import frame_score, segment_score


def test_dbscan_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.cluster import DBSCAN

    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(2, 60)
        pts = rng.rand(n, 2) * 2
        dist = (
            np.abs(pts[:, None, 0] - pts[None, :, 0])
            + np.abs(pts[:, None, 1] - pts[None, :, 1])
        ) / 2
        eps = rng.choice([0.05, 0.1, 0.3])
        min_samples = rng.randint(2, 5)
        ours = _dbscan(dist, eps, min_samples)
        theirs = DBSCAN(eps=eps, min_samples=min_samples, metric="precomputed").fit_predict(dist)
        # labels may be permuted; compare partitions + noise sets
        assert (ours == -1).tolist() == (theirs == -1).tolist()
        mapping = {}
        for a, b in zip(ours, theirs):
            if a == -1:
                continue
            assert mapping.setdefault(a, b) == b, (trial, ours, theirs)


def test_merge_window_boundaries():
    w1 = [[0.0, 1.0, "a"], [1.5, 2.5, "a"]]
    w2 = [[2.5, 3.0, "a"], [3.5, 4.0, "b"]]
    w3 = [[4.0, 5.0, "a"]]  # different cluster than previous end -> no merge
    merged = merge_window_boundaries([w1, w2, w3])
    assert merged == [
        [0.0, 1.0, "a"],
        [1.5, 3.0, "a"],
        [3.5, 4.0, "b"],
        [4.0, 5.0, "a"],
    ]


def test_consolidate_clustering_majority_and_mean():
    trials = [
        {"onset": [1.00], "offset": [2.00], "cluster": ["x"]},
        {"onset": [1.02], "offset": [2.02], "cluster": ["x"]},
        {"onset": [1.04], "offset": [1.98], "cluster": ["y"]},
    ]
    out = consolidate_by_clustering(trials, eps=0.1, min_samples=2)
    assert out["cluster"] == ["x"]
    assert out["onset"][0] == pytest.approx(np.mean([1.0, 1.02, 1.04]))
    assert out["offset"][0] == pytest.approx(np.mean([2.0, 2.02, 1.98]))


def test_consolidate_clustering_noise_dropped():
    trials = [
        {"onset": [1.0, 5.0], "offset": [2.0, 6.0], "cluster": ["x", "z"]},
        {"onset": [1.01], "offset": [2.01], "cluster": ["x"]},
    ]
    out = consolidate_by_clustering(trials, eps=0.05, min_samples=2)
    assert out["cluster"] == ["x"]  # the lone (5,6) segment is noise


def test_consolidate_voting_majority():
    codebook = {"x": 0, "y": 1}
    trials = [
        {"onset": [0.0], "offset": [1.0], "cluster": ["x"]},
        {"onset": [0.0], "offset": [1.0], "cluster": ["x"]},
        {"onset": [0.5], "offset": [1.5], "cluster": ["y"]},
    ]
    out = consolidate_by_voting(trials, 0.1, codebook)
    assert out["cluster"] == ["x"]
    assert out["onset"][0] == pytest.approx(0.0)
    assert out["offset"][0] == pytest.approx(1.0)


def test_consolidate_voting_empty():
    out = consolidate_by_voting([{"onset": [], "offset": [], "cluster": []}], 0.01, {})
    assert out == {"onset": [], "offset": [], "cluster": []}


def test_segment_score_greedy_matching():
    pred = {"onset": [0.0, 1.0, 2.0], "offset": [0.5, 1.5, 2.5],
            "cluster": ["a", "a", "b"]}
    label = {"onset": [0.01, 1.02, 3.0], "offset": [0.5, 1.49, 3.5],
             "cluster": ["a", "a", "b"]}
    tp, p_pred, p_label, precision, recall, f1 = segment_score(
        pred, label, tolerance=0.05
    )
    assert (tp, p_pred, p_label) == (2, 3, 3)
    assert precision == pytest.approx(2 / 3)
    assert recall == pytest.approx(2 / 3)


def test_segment_score_label_consumed_once():
    # two predictions match the same label -> only one TP
    pred = {"onset": [0.0, 0.01], "offset": [0.5, 0.51], "cluster": ["a", "a"]}
    label = {"onset": [0.0], "offset": [0.5], "cluster": ["a"]}
    tp, p_pred, p_label, *_ = segment_score(pred, label, tolerance=0.05)
    assert (tp, p_pred, p_label) == (1, 2, 1)


def test_segment_score_target_cluster():
    pred = {"onset": [0.0, 1.0], "offset": [0.5, 1.5], "cluster": ["a", "b"]}
    label = {"onset": [0.0, 1.0], "offset": [0.5, 1.5], "cluster": ["a", "b"]}
    tp, p_pred, p_label, *_ = segment_score(pred, label, target_cluster="a",
                                            tolerance=0.01)
    assert (tp, p_pred, p_label) == (1, 1, 1)


def test_frame_score_exact():
    pred = {"onset": [0.0], "offset": [1.0], "cluster": ["v"]}
    label = {"onset": [0.0], "offset": [1.0], "cluster": ["v"]}
    tp, p_pred, p_label, precision, recall, f1 = frame_score(
        pred, label, time_per_frame_for_scoring=0.1
    )
    assert tp == p_pred == p_label == 10
    assert f1 == pytest.approx(1.0)


def test_frame_score_partial_overlap():
    pred = {"onset": [0.0], "offset": [1.0], "cluster": ["v"]}
    label = {"onset": [0.5], "offset": [1.5], "cluster": ["v"]}
    tp, p_pred, p_label, *_ = frame_score(pred, label,
                                          time_per_frame_for_scoring=0.1)
    assert (tp, p_pred, p_label) == (5, 10, 10)


def test_frame_score_cluster_mismatch():
    pred = {"onset": [0.0], "offset": [1.0], "cluster": ["a"]}
    label = {"onset": [0.0], "offset": [1.0], "cluster": ["b"]}
    tp, *_ = frame_score(pred, label, time_per_frame_for_scoring=0.1)
    assert tp == 0


def test_frame_score_absent_target_cluster_is_zero_not_keyerror():
    """A file containing the target cluster in neither prediction nor label
    contributes zeros (graceful superset of the reference, which raises)."""
    from whisperseg_tpu.scoring import frame_score

    pred = {"onset": [0.1], "offset": [0.2], "cluster": ["a"]}
    label = {"onset": [0.1], "offset": [0.2], "cluster": ["a"]}
    tp, p_pred, p_label, *_ = frame_score(pred, label, target_cluster="X")
    assert (tp, p_pred, p_label) == (0, 0, 0)
