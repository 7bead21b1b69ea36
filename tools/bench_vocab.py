"""ORBvoc-scale (k=10, L=6, ~1.1M words) vocabulary benchmark.

Measures what the reference pays in DBoW2 for the real ORBvoc.txt
(/root/reference/src/slam.cpp:370-380): text parse time (native C++ and
numpy), batched tree-descent latency for a frame's 1500 descriptors, and
descent recall under descriptor noise.

Usage: python tools/bench_vocab.py [--depth 6] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--keep", type=str, default=None,
                    help="write the vocab text file here and keep it")
    args = ap.parse_args()

    import numpy as np

    from vslam_tpu.loop import vocabulary as vocab_mod

    out = {"k": 10, "depth": args.depth, "words": 10 ** args.depth}

    t0 = time.perf_counter()
    voc = vocab_mod.synthetic_vocab(k=10, depth=args.depth, seed=0)
    out["build_s"] = round(time.perf_counter() - t0, 2)
    print(f"build synthetic k=10 L={args.depth}: {out['build_s']}s "
          f"({voc.num_words} words, {len(voc.parent)} nodes)", flush=True)

    path = args.keep or "/tmp/vslam_bench_voc.txt"
    t0 = time.perf_counter()
    vocab_mod.save_dbow2_text(voc, path)
    out["save_s"] = round(time.perf_counter() - t0, 2)
    out["file_mb"] = round(os.path.getsize(path) / 1e6, 1)
    print(f"save text: {out['save_s']}s ({out['file_mb']} MB)", flush=True)

    from vslam_tpu.io import native

    if native.available():
        t0 = time.perf_counter()
        parsed = native.parse_vocab_text(path)
        out["parse_native_s"] = round(time.perf_counter() - t0, 2)
        print(f"parse (native C++): {out['parse_native_s']}s", flush=True)
        assert parsed is not None and len(parsed[2]) == len(voc.parent) - 1

    t0 = time.perf_counter()
    v2 = vocab_mod.load_dbow2_text(path)
    out["parse_full_s"] = round(time.perf_counter() - t0, 2)
    print(f"load_dbow2_text (incl. tree assembly): "
          f"{out['parse_full_s']}s", flush=True)
    assert v2.num_words == voc.num_words

    # descent latency: one frame's worth of descriptors
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    word_gt = rng.randint(0, voc.num_words, 1500)
    descs = voc.node_desc[voc.node_of_word[word_gt]].copy()
    descs ^= (rng.rand(1500, 256) < (3 / 256.0)).astype(np.uint8)

    dv = vocab_mod.DeviceVocabulary(voc)
    bits = jnp.asarray(descs)
    valid = jnp.ones(1500, bool)
    words = jax.block_until_ready(dv.words(bits, valid))  # compile
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(dv.words(bits, valid))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    out["descent_ms_1500"] = round(times[len(times) // 2], 2)
    out["backend"] = jax.default_backend()
    recall = float(np.mean(np.asarray(words) == word_gt))
    out["recall_3bit_noise"] = round(recall, 4)
    print(f"descent 1500 descs ({out['backend']}): "
          f"{out['descent_ms_1500']} ms, recall {recall:.3f}", flush=True)

    if not args.keep:
        os.unlink(path)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
