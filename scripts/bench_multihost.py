"""Multi-host scaling measurement on the synthetic scene (CPU workers).

N worker processes on one machine are the honest local stand-in for N
hosts (no multi-host TPU hardware on this rig); the exchange medium is the
shared workspace filesystem, standing in for the DCN depth-map exchange.
Run twice per N: the first pass warms the shared XLA compile cache so the
second pass measures steady-state throughput. Results -> MULTIHOST.md.

Usage: python scripts/bench_multihost.py [max_hosts]
"""

import json
import os
import shutil
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    max_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pathlib import Path

    from tests.test_pipeline import build_synthetic_workspace
    from deep3d_aerial_tpu.pipeline.config import PipelineConfig
    from deep3d_aerial_tpu.parallel.multihost_driver import launch_local

    base = Path("/tmp/mh_bench")
    results = {}
    for n in [1] + [h for h in (2, 4) if h <= max_hosts]:
        for attempt in ("warm", "timed"):
            ws = base / f"ws_n{n}_{attempt}"
            if ws.exists():
                shutil.rmtree(ws)
            build_synthetic_workspace(ws, n_grid=5)
            cfg = PipelineConfig(
                image_w=96, image_h=64, image_scale=1.0,
                scene_block_size=[40.0, 40.0, 120.0], block_overlap=2.0,
                view_num=3, num_depth=32, min_interval=0.5,
                model_type="casmvsnet", allow_random_weights=True,
                fusion_num=4, geo_consist_num=2, photomatric_threshold=0.0,
                position_threshold=2.0, depth_threshold=0.05,
                normal_threshold=180.0,
                run_create_mesh=False, run_create_dsm=False,
            )
            cfg_path = ws / "cfg.yaml"
            cfg.to_yaml(cfg_path)
            # fixed 2 CPUs per "host" so 1-vs-N measures scaling, not core
            # contention (this rig has 4 cores)
            agg = launch_local(str(ws), str(cfg_path), n, cpus_per_host=2)
        results[n] = agg
        print(json.dumps({
            "n_hosts": n,
            "depth_maps": agg["total_depth_maps"],
            "wall_s": round(agg["wall_seconds"], 2),
            "maps_per_s": round(agg["agg_maps_per_s"], 3),
        }), flush=True)

    base_rate = results[1]["agg_maps_per_s"]
    for n, agg in results.items():
        eff = agg["agg_maps_per_s"] / (base_rate * n) if base_rate else 0
        print(json.dumps({"n_hosts": n,
                          "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
