import pytest
import numpy as np

from deep3d_aerial_tpu.parallel.multihost import (
    assign_blocks,
    exchange_cost,
    plan_hosts,
)


def make_blocks(n_blocks=6, refs_per_block=4):
    blocks = []
    vid = 0
    for b in range(n_blocks):
        refs = list(range(vid, vid + refs_per_block))
        vid += refs_per_block - 1  # one-view overlap between adjacent blocks
        blocks.append(([0.0, 1, 0, 1, 0, 1], refs))
    return blocks


def make_pairs(blocks):
    all_refs = sorted({r for _, refs in blocks for r in refs})
    return {r: [s for s in all_refs if abs(s - r) <= 2 and s != r]
            for r in all_refs}


def test_assign_blocks_balanced():
    blocks = make_blocks(7)
    assign = assign_blocks(blocks, 3)
    assert sorted(sum(assign, [])) == list(range(7))
    sizes = [len(a) for a in assign]
    assert max(sizes) - min(sizes) <= 1


def test_plan_hosts_cover_and_partition():
    blocks = make_blocks(6)
    pairs = make_pairs(blocks)
    plans = plan_hosts(blocks, pairs, n_hosts=3)

    # every block appears exactly once
    all_blocks = sorted(b for p in plans for b in p.block_indices)
    assert all_blocks == list(range(6))

    # every needed view is either owned or fetched, never both
    for p in plans:
        assert p.owned_views | set(p.fetch_views) == p.needed_views
        assert not (p.owned_views & set(p.fetch_views))

    # ownership is a partition of the union of needed views
    owned_union = set()
    for p in plans:
        assert not (owned_union & p.owned_views)
        owned_union |= p.owned_views
    assert owned_union == set().union(*(p.needed_views for p in plans))

    # fetch targets actually own the views they serve
    by_host = {p.host_id: p for p in plans}
    for p in plans:
        for v, owner in p.fetch_views.items():
            assert v in by_host[owner].owned_views


def test_plan_deterministic():
    blocks = make_blocks(5)
    pairs = make_pairs(blocks)
    a = plan_hosts(blocks, pairs, n_hosts=2)
    b = plan_hosts(blocks, pairs, n_hosts=2)
    for p, q in zip(a, b):
        assert p.block_indices == q.block_indices
        assert p.owned_views == q.owned_views
        assert p.fetch_views == q.fetch_views


def test_single_host_no_exchange():
    blocks = make_blocks(4)
    pairs = make_pairs(blocks)
    plans = plan_hosts(blocks, pairs, n_hosts=1)
    assert exchange_cost(plans) == 0
    assert plans[0].block_indices == [0, 1, 2, 3]


@pytest.mark.slow
def test_multihost_driver_exchange(tmp_path):
    """Two worker processes split the synthetic scene: each infers only its
    OWNED views, exchanges artifacts through the shared workspace, fuses
    only its blocks — and together they produce every depth map exactly
    once plus fused clouds for all blocks."""
    import json
    import os
    import subprocess
    import sys

    from deep3d_aerial_tpu.pipeline.config import PipelineConfig
    from tests.test_pipeline import build_synthetic_workspace

    ws = build_synthetic_workspace(tmp_path / "ws")
    cfg = PipelineConfig(
        image_w=96, image_h=64, image_scale=1.0,
        scene_block_size=[40.0, 40.0, 120.0], block_overlap=2.0,
        view_num=3, num_depth=32, min_interval=0.5,
        model_type="casmvsnet", allow_random_weights=True,
        fusion_num=4, geo_consist_num=2, photomatric_threshold=0.0,
        position_threshold=2.0, depth_threshold=0.05, normal_threshold=180.0,
        run_create_mesh=False, run_create_dsm=False,
    )
    cfg_path = tmp_path / "cfg.yaml"
    cfg.to_yaml(cfg_path)

    from deep3d_aerial_tpu.parallel.multihost_driver import launch_local

    agg = launch_local(str(ws), str(cfg_path), 2)
    assert agg["n_hosts"] == 2
    recs = agg["hosts"]
    owned = [set(r["owned_views"]) for r in recs]
    # ownership partitions: disjoint, and every produced map exists
    assert not (owned[0] & owned[1])
    mvs = ws / "dense" / "MVS"
    produced = {f for f in os.listdir(mvs) if f.endswith("_init.pfm")}
    assert len(produced) == len(owned[0] | owned[1])
    # both hosts fused their assigned blocks
    fused = [f for f in os.listdir(ws / "dense" / "fusion")
             if f.endswith(".ply")]
    blocks_covered = set()
    for r in recs:
        blocks_covered.update(r["blocks"])
    assert len(fused) >= 1 and len(blocks_covered) >= len(fused)
    # at least one host fetched a view produced by the other (the exchange)
    assert any(r["fetched_views"] for r in recs)
