"""Multi-host pipeline driver: executes one host's share of the pipeline.

Wires the deterministic plans of parallel.multihost into real multi-process
execution: every host derives the SAME plan from the view-selection
artifacts (no coordination round), infers depth maps only for the views it
OWNS, exchanges artifacts with the other hosts, then fuses only its
assigned scene blocks.

The exchange medium here is the shared workspace filesystem — the honest
local stand-in for the DCN depth-map exchange of a real pod deployment
(each view is produced exactly once by its owner and read by every host
that fuses a block referencing it; see SURVEY §2.10). `jax.distributed`
is initialized when a coordinator address is given so the process group is
a real one on backends that support it.

Launch N local hosts:
    python -m deep3d_aerial_tpu.parallel.multihost_driver \
        --workspace WS --config cfg.yaml --n_hosts 4        # spawns workers
Single worker (what the launcher spawns):
    ... --n_hosts 4 --host_id 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from typing import Optional

from .multihost import initialize_distributed, plan_hosts


def _marker(ws: str, name: str) -> str:
    d = os.path.join(ws, "multihost")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def _wait_for(paths, timeout: float = 1800.0, poll: float = 0.5):
    t0 = time.time()
    missing = list(paths)
    while missing:
        missing = [p for p in missing if not os.path.exists(p)]
        if not missing:
            return
        if time.time() - t0 > timeout:
            raise TimeoutError(f"exchange timeout; missing: {missing[:4]}")
        time.sleep(poll)


def run_host(
    workspace: str,
    config,
    n_hosts: int,
    host_id: int,
    coordinator: Optional[str] = None,
) -> dict:
    """Run this host's share -> timing/throughput record (also written to
    <workspace>/multihost/host<id>.json)."""
    from ..io import text_formats as tf
    from ..pipeline.orchestrator import AerialPipeline

    if coordinator:
        initialize_distributed(coordinator, n_hosts, host_id)

    pipe = AerialPipeline(workspace, config)
    t_start = time.time()

    # stage 1: view selection on host 0 only (deterministic artifacts)
    sel_marker = _marker(workspace, "view_selection.done")
    if host_id == 0:
        if config.run_view_selection:
            pipe.select_view()
        open(sel_marker, "w").write("ok")
    else:
        _wait_for([sel_marker])

    blocks = tf.read_blocks(os.path.join(pipe.export_path, "blocks.txt"))
    pairs = dict(
        (ref, [s for s, _ in plist])
        for ref, plist in tf.read_view_pairs(
            os.path.join(pipe.export_path, "viewpair.txt"))
    )
    plans = plan_hosts(blocks, pairs, n_hosts,
                       fusion_num=config.fusion_num)
    mine = plans[host_id]

    # views each of MY blocks needs (refs + their fusion sources): a block
    # becomes fusable the moment these are published — no global barrier
    block_views = {}
    for bi in mine.block_indices:
        req = set()
        for r in blocks[bi][1]:
            req.add(r)
            req.update(list(pairs.get(r, []))[:config.fusion_num])
        block_views[bi] = req

    # global view priority = earliest block (ANY host's) that needs the
    # view: every owner produces early-block views first, so early blocks
    # become fusable while later inference is still running (otherwise a
    # block's views land spread across each owner's whole run and fusion
    # never overlaps — measured overlap 0.0 with id-order inference)
    view_prio = {}
    for bi, (_, refs) in enumerate(blocks):
        req = set()
        for r in refs:
            req.add(r)
            req.update(list(pairs.get(r, []))[:config.fusion_num])
        for v in req:
            view_prio[v] = min(view_prio.get(v, bi), bi)
    owned_order = sorted(mine.owned_views,
                         key=lambda v: (view_prio.get(v, 1 << 30), v))

    def publish(ref_id):
        open(_marker(workspace, f"view_{ref_id}.done"), "w").write("ok")

    # stage 3 runs CONCURRENTLY with stage 2: a fusion worker thread fuses
    # each assigned block as soon as its views land (local publishes
    # overlap remaining inference; remote fetches overlap other hosts'
    # inference). jit'd fusion releases the GIL during execution.
    import threading

    fuse_times = {}
    fuse_err = []

    def fusion_worker():
        try:
            pending = dict(block_views)
            while pending:
                ready = [bi for bi, req in pending.items()
                         if all(os.path.exists(
                             _marker(workspace, f"view_{v}.done"))
                             for v in req)]
                if not ready:
                    time.sleep(0.2)
                    continue
                for bi in sorted(ready):
                    pending.pop(bi)
                    t0 = time.time()
                    if config.run_depth_fusion:
                        pipe.fuse_depth_map(block_indices=[bi])
                    fuse_times[bi] = time.time() - t0
        except Exception as e:  # surfaced after join
            fuse_err.append(e)

    fuser = threading.Thread(target=fusion_worker, daemon=True)
    fuser.start()

    # stage 2: dense matching for OWNED views only, publishing per view
    t_mvs0 = time.time()
    n_owned = len(mine.owned_views)
    stub_s = float(os.environ.get("MULTIHOST_STUB_SECONDS", "0") or 0)
    if config.run_mvs:
        if stub_s > 0:
            _stub_dense_match(pipe, owned_order, stub_s, publish)
        else:
            pipe.dense_match(view_filter=mine.owned_views,
                             view_order=owned_order,
                             on_view_done=publish)
    else:
        for v in owned_order:
            publish(v)
    t_mvs = time.time() - t_mvs0
    open(_marker(workspace, f"mvs_host{host_id}.done"), "w").write("ok")

    fuser.join(timeout=1800)
    if fuse_err:
        raise fuse_err[0]
    t_end = time.time()

    record = {
        "host_id": host_id,
        "n_hosts": n_hosts,
        "blocks": mine.block_indices,
        "owned_views": sorted(mine.owned_views),
        "fetched_views": {str(k): v for k, v in mine.fetch_views.items()},
        "n_depth_maps": n_owned,
        "mvs_seconds": t_mvs,
        "fuse_seconds": sum(fuse_times.values()),
        "overlap_seconds": max(0.0, t_mvs + sum(fuse_times.values())
                               - (t_end - t_start)),
        "total_seconds": t_end - t_start,
        "maps_per_s": (n_owned / t_mvs) if t_mvs > 0 and n_owned else 0.0,
    }
    with open(_marker(workspace, f"host{host_id}.json"), "w") as f:
        json.dump(record, f, indent=1)
    return record


def _stub_dense_match(pipe, owned_views, seconds_per_map, publish):
    """Deterministic compute stand-in: per owned view, sleep a fixed
    `seconds_per_map` then write a synthetic mid-range depth plane + full
    confidence (real artifact path, real cam txt). Makes per-map cost
    constant across hosts so N-host runs measure STRUCTURAL efficiency
    (plan imbalance + exchange + barrier), not CPU cache contention
    (docs/MULTIHOST.md round-2 confound)."""
    import numpy as np

    from ..io import text_formats as tf
    from ..io.pfm import write_pfm
    from ..pipeline.dataset import EvalDataset

    cfg = pipe.cfg
    ds = EvalDataset(pipe.export_path, view_num=cfg.view_num,
                     num_depth=cfg.num_depth, resize_scale=cfg.image_scale,
                     max_h=cfg.max_h, max_w=cfg.max_w)
    idx_by_ref = {s[0]: i for i, s in enumerate(ds.samples)}
    for ref_id in owned_views:
        s = ds.build(idx_by_ref[ref_id])
        time.sleep(seconds_per_map)
        H, W = s.imgs.shape[1:3]
        mid = 0.5 * (s.depth_min + s.depth_max)
        write_pfm(os.path.join(pipe.mvs_path, f"{s.ref_name}_init.pfm"),
                  np.full((H, W), mid, np.float32))
        write_pfm(os.path.join(pipe.mvs_path, f"{s.ref_name}_prob.pfm"),
                  np.ones((H, W), np.float32))
        tf.write_mvs_cam(os.path.join(pipe.mvs_path, f"{s.ref_name}.txt"),
                         s.ref_cam)
        publish(ref_id)


def launch_local(workspace: str, config_path: str, n_hosts: int,
                 cpus_per_host: int = 0) -> dict:
    """Spawn n_hosts worker processes against a shared workspace; aggregate
    throughput. Workers run on the CPU backend (JAX_PLATFORMS=cpu) — N
    processes on one machine is the honest local stand-in for N hosts.

    cpus_per_host > 0 pins each worker to its own CPU set (taskset), so
    'a host' is a FIXED resource and 1-vs-N throughput measures scaling
    rather than core contention."""
    procs = []
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # shared persistent compile cache: repeat launches skip XLA compiles,
    # so steady-state throughput (not compile time) dominates the timings
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/.jax_cache_cpu")
    for h in range(n_hosts):
        cmd = [sys.executable, "-m",
               "deep3d_aerial_tpu.parallel.multihost_driver",
               "--workspace", workspace, "--config", config_path,
               "--n_hosts", str(n_hosts), "--host_id", str(h)]
        if cpus_per_host > 0:
            cpus = ",".join(str(c) for c in range(
                h * cpus_per_host, (h + 1) * cpus_per_host))
            cmd = ["taskset", "-c", cpus] + cmd
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait() for p in procs]
    if any(rcs):
        raise RuntimeError(f"worker exit codes: {rcs}")
    records = [
        json.load(open(_marker(workspace, f"host{h}.json")))
        for h in range(n_hosts)
    ]
    total_maps = sum(r["n_depth_maps"] for r in records)
    wall = max(r["total_seconds"] for r in records)
    agg = {
        "n_hosts": n_hosts,
        "total_depth_maps": total_maps,
        "wall_seconds": wall,
        "agg_maps_per_s": total_maps / wall if wall else 0.0,
        "hosts": records,
    }
    with open(_marker(workspace, "aggregate.json"), "w") as f:
        json.dump(agg, f, indent=1)
    return agg


def _force_cpu_backend():
    """Workers run on CPU; the container's remote-TPU plugin overrides
    JAX_PLATFORMS=cpu and claims the (exclusive) chip — drop it."""
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return
    try:
        import jax
        import jax._src.xla_bridge as _xb

        jax.config.update("jax_platforms", "cpu")
        for name in list(getattr(_xb, "_backend_factories", {})):
            if "axon" in name:
                _xb._backend_factories.pop(name, None)
    except Exception:
        pass


def main():
    _force_cpu_backend()
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--n_hosts", type=int, default=1)
    ap.add_argument("--host_id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()

    from ..pipeline.config import PipelineConfig

    cfg = PipelineConfig.from_yaml(args.config)
    if args.host_id is None:
        agg = launch_local(args.workspace, args.config, args.n_hosts)
        print(json.dumps({k: v for k, v in agg.items() if k != "hosts"}))
    else:
        rec = run_host(args.workspace, cfg, args.n_hosts, args.host_id,
                       args.coordinator)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
