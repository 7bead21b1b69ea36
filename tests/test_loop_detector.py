import numpy as np
import pytest

from vslam_tpu.loop.detector import BowDatabase, LoopDetector


def bow_of(words):
    w = 1.0 / len(words)
    return {int(x): w for x in words}


def test_inverted_file_counts():
    db = BowDatabase()
    db.insert(0, bow_of([1, 2, 3]))
    db.insert(1, bow_of([3, 4, 5]))
    counts = db.shared_word_counts(bow_of([3, 4]))
    # reference quirk: counts = occurrences - 1
    assert counts[1] == 1  # shares words 3 and 4 -> 2 occurrences -> 1
    assert counts[0] == 0  # shares word 3 -> 0


def test_detector_consistency_groups():
    det = LoopDetector(num_consistency=3)
    graph = {i: set() for i in range(20)}
    # fill db with distinct keyframes (several words each: the reference's
    # occurrences-1 counting quirk zeroes single-word overlaps)
    for s in range(5):
        det.detect(s, bow_of([100 + s, 1000 + s, 2000 + s]), {}, graph, 20)
    # now repeatedly present keyframes nearly identical to slot 0, each
    # covisible with its predecessor so min_connected_covisible < 1
    got = []
    for s in range(5, 10):
        # each query keyframe is covisible with every earlier query keyframe
        # (as consecutive keyframes are in practice), so they are excluded
        # from candidate counting and only slot 0 remains a candidate
        covis = {p: 50 for p in range(5, s)}
        graph[s] = set(covis)
        for n in covis:
            graph[n].add(s)
        out = det.detect(s, bow_of([100, 1000, 2000]), covis, graph, 20)
        got.append(list(out))
    # candidate slot 0 must appear only after 3 consistent detections
    assert got[0] == [] and got[1] == []
    assert any(0 in g for g in got[2:]), got


def test_detector_excludes_connected():
    det = LoopDetector(num_consistency=1)
    graph = {0: {1}, 1: {0}, 2: set()}
    covis = {1: 100}  # strongly covisible
    det.detect(0, bow_of([7, 8]), {}, {0: set()}, 20)
    det.db.insert(1, bow_of([7, 8]))
    # keyframe 2 sees the same words; 1 is covisible with weight 100 -> excluded
    out = det.detect(2, bow_of([7, 8]), covis, {2: {1}, 1: {2}}, 20)
    assert 1 not in out


def test_relocalization_candidates_ranked():
    det = LoopDetector()
    det.db.insert(0, bow_of([1, 2, 3, 4]))
    det.db.insert(1, bow_of([1, 2, 30, 40]))
    det.db.insert(2, bow_of([100, 200]))
    cands = det.relocalization_candidates(bow_of([1, 2, 3, 4]))
    assert cands[0] == 0
    assert 2 not in cands
