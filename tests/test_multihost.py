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
