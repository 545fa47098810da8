"""Input-pipeline throughput proof at reference training scale (VERDICT r2
item 7): the 2-view recipe trains at global batch 16 (reference
config/experiment/re10k_2view.yaml, data_module.py:90-110) — measure
examples/sec of the threaded decode pipeline on synthetic chunks and
compare against the TPU train-step rate.

Runs CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python tools/bench_input_pipeline.py [--workers 0 2 4] [--hw 360 640]

Writes outputs/input_pipeline_bench.json.
"""
import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4])
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--n-scenes", type=int, default=224)
    ap.add_argument("--n-views", type=int, default=12)
    # RE10K chunks store ~360x640 JPEG frames
    ap.add_argument("--hw", type=int, nargs=2, default=(360, 640))
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    from tests.test_data import make_chunk
    from vicasplat_tpu.data.data_module import DataModule

    results = {"config": vars(args)}
    with tempfile.TemporaryDirectory() as td:
        root = pathlib.Path(td)
        t0 = time.perf_counter()
        make_chunk(root, n_scenes=args.n_scenes, n_views=args.n_views,
                   hw=tuple(args.hw))
        print(f"synthetic chunk: {args.n_scenes} scenes x {args.n_views} "
              f"views @ {args.hw} ({time.perf_counter() - t0:.1f}s)")

        ds_cfg = {
            "re10k": {
                "name": "re10k",
                "roots": [str(root)],
                "view_sampler": {
                    "name": "bounded",
                    "num_context_views": 2,
                    "num_target_views": 4,
                    "min_distance_between_context_views": 4,
                    "max_distance_between_context_views": 8,
                },
                "input_image_shape": [256, 256],
            }
        }
        for nw in args.workers:
            dm = DataModule(
                ds_cfg,
                {"train": {"batch_size": args.batch_size, "seed": 0,
                           "num_workers": nw, "prefetch": 2}},
            )
            n_batches = 0
            n_examples = 0
            t0 = time.perf_counter()
            it = iter(dm.train_dataloader())
            first = next(it)  # warm-up batch outside the timed window
            t0 = time.perf_counter()
            loader = it
            for batch in it:
                n_batches += 1
                n_examples += batch["context"]["image"].shape[0]
                if n_batches >= args.batches:
                    break
            loader.close()
            dt = time.perf_counter() - t0
            eps = n_examples / dt if dt > 0 else float("inf")
            print(f"num_workers={nw}: {n_examples} examples in {dt:.2f}s "
                  f"= {eps:.1f} ex/s ({eps / args.batch_size:.2f} batches/s)")
            results[f"workers_{nw}"] = {
                "examples_per_s": round(eps, 2),
                "batches_per_s": round(eps / args.batch_size, 3),
                "n_examples": n_examples,
                "seconds": round(dt, 3),
            }

    out = pathlib.Path(__file__).resolve().parents[1] / "outputs"
    out.mkdir(exist_ok=True)
    with open(out / "input_pipeline_bench.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out / 'input_pipeline_bench.json'}")


if __name__ == "__main__":
    main()
