"""Vocabulary recall on REAL descriptors (VERDICT r2 item 7).

Trains a BoW vocabulary from the reference's bundled EuRoC sample imagery
(the reference equally ships a vocabulary trained on real images —
ORBvoc.txt, loaded at slam.cpp:370-380) and measures place-recognition
recall with a genuinely different query view: each stereo pair's RIGHT
image queries a database built from the LEFT images. The 11 cm baseline
plus independent noise/exposure make the right view a realistic "revisit"
of the left — same place, different descriptors — so top-1 recall here is
the real-image analogue of loop/reloc candidate retrieval
(TemplatedVocabulary.h:1127-1193 transform + L1 scoring + the
detect_relocalization_candidate shared-word gate, tracking.h:169-221).

Usage: python tools/vocab_recall_real.py [--depth 5] [--features 1500]
Writes one JSON line; run on the TPU (descent is a device program).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLE_DIR = "/root/reference/data/euroc_V1"
CALIB = "/root/reference/calibration_file/euroc_v1_123_ds_calib.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5,
                    help="tree depth (k=10): 5 -> 1e5 words, ORBvoc-like")
    ap.add_argument("--features", type=int, default=1500)
    ap.add_argument("--max-train", type=int, default=150_000,
                    help="training-descriptor subsample cap")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from vslam_tpu.frontend.features import extract_features
    from vslam_tpu.io import euroc
    from vslam_tpu.loop import vocabulary as vocab_mod

    seq = euroc.load_sample_dir(SAMPLE_DIR)
    n = seq.num_frames
    left_sets, right_sets = [], []
    for i in range(n):
        for side, out in ((0, left_sets), (1, right_sets)):
            img = euroc.load_image(seq.image_paths[i][side])
            ft = extract_features(jnp.asarray(img),
                                  num_features=args.features,
                                  quality_level=0.001)
            out.append(np.asarray(ft.bits)[np.asarray(ft.valid)])

    train_desc = np.concatenate(left_sets)
    rng = np.random.RandomState(0)
    if len(train_desc) > args.max_train:
        train_desc = train_desc[rng.choice(len(train_desc), args.max_train,
                                           replace=False)]
    t0 = time.perf_counter()
    voc = vocab_mod.train(train_desc, k=10, depth=args.depth, seed=0)
    vocab_mod.set_idf_weights(voc, left_sets)
    train_s = time.perf_counter() - t0

    dv = vocab_mod.DeviceVocabulary(voc)

    def bow_of(bits):
        b = jnp.asarray(bits)
        words = np.asarray(dv.words(b, jnp.ones(len(bits), bool)))
        return vocab_mod.bow_from_words(voc, words)

    db = [bow_of(b) for b in left_sets]
    top1 = top5 = 0
    margins = []
    cand_recall = 0  # detect_relocalization_candidate-style shared-word gate
    from vslam_tpu.loop.detector import BowDatabase

    bdb = BowDatabase()
    for i, bow in enumerate(db):
        bdb.insert(i, bow)
    for i in range(n):
        q = bow_of(right_sets[i])
        scores = np.asarray([vocab_mod.l1_score(q, db[j]) for j in range(n)])
        order = np.argsort(-scores)
        if order[0] == i:
            top1 += 1
            margins.append(float(scores[i] - scores[order[1]]))
        if i in order[:5]:
            top5 += 1
        counts = bdb.shared_word_counts(q)
        if counts:
            mx = max(counts.values())
            cands = sorted((j for j, c in counts.items()
                            if c > int(0.8 * mx)),
                           key=lambda j: -vocab_mod.l1_score(q, db[j]))[:5]
            if i in cands:
                cand_recall += 1

    out = {
        "frames": n,
        "words": int(voc.node_desc.shape[0] and len(voc.node_of_word)),
        "depth": args.depth,
        "train_descriptors": int(len(train_desc)),
        "train_seconds": round(train_s, 1),
        "stereo_top1_recall": round(top1 / n, 3),
        "stereo_top5_recall": round(top5 / n, 3),
        "reloc_candidate_recall_top5": round(cand_recall / n, 3),
        "mean_top1_margin": round(float(np.mean(margins)), 4) if margins
        else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
