"""Multi-host scene partitioning (the cross-host axis of SURVEY §2.10).

Scene blocks are the unit of host parallelism: each host runs dense matching
+ fusion for its assigned blocks; views shared across block boundaries are
owned by the lowest-indexed host that needs them and exchanged as depth-map
artifacts (file contract locally, DCN collectives on a pod).

This module holds the deterministic partitioning/ownership logic (pure,
unit-testable); `initialize_distributed` wires jax.distributed for real
multi-process runs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple


@dataclasses.dataclass
class HostPlan:
    host_id: int
    block_indices: List[int]
    ref_views: Set[int]  # ref views this host infers depth for
    needed_views: Set[int]  # all views this host's fusion reads
    owned_views: Set[int]  # views this host is responsible for producing
    fetch_views: Dict[int, int]  # view -> owner host to fetch from


def assign_blocks(
    blocks: Sequence[Tuple[Sequence[float], Sequence[int]]],
    n_hosts: int,
) -> List[List[int]]:
    """Balanced block -> host assignment (largest-first by ref count)."""
    order = sorted(range(len(blocks)), key=lambda i: -len(blocks[i][1]))
    loads = [0] * n_hosts
    assign: List[List[int]] = [[] for _ in range(n_hosts)]
    for bi in order:
        h = min(range(n_hosts), key=lambda k: loads[k])
        assign[h].append(bi)
        loads[h] += max(1, len(blocks[bi][1]))
    for lst in assign:
        lst.sort()
    return assign


def plan_hosts(
    blocks: Sequence[Tuple[Sequence[float], Sequence[int]]],
    pairs: Dict[int, Sequence[int]],
    n_hosts: int,
    fusion_num: int = 10,
) -> List[HostPlan]:
    """Full multi-host plan: assignment + view ownership + exchange lists.

    Ownership rule: each view is owned by exactly one of the hosts that
    need it, chosen to BALANCE inference load (fewest owned views so far,
    ties to the lowest host id). Deterministic — every host derives the
    same plan independently, no coordination round needed. (A plain
    lowest-host rule piles every shared view onto host 0 in overlapping
    scenes and serializes the MVS stage.)
    """
    assign = assign_blocks(blocks, n_hosts)

    needed: List[Set[int]] = []
    refs: List[Set[int]] = []
    for h in range(n_hosts):
        need: Set[int] = set()
        ref_set: Set[int] = set()
        for bi in assign[h]:
            for r in blocks[bi][1]:
                ref_set.add(r)
                need.add(r)
                need.update(list(pairs.get(r, []))[:fusion_num])
        needed.append(need)
        refs.append(ref_set)

    owner: Dict[int, int] = {}
    loads = [0] * n_hosts
    all_views = sorted(set().union(*needed)) if needed else []
    for v in all_views:
        cands = [h for h in range(n_hosts) if v in needed[h]]
        h = min(cands, key=lambda k: (loads[k], k))
        owner[v] = h
        loads[h] += 1

    plans = []
    for h in range(n_hosts):
        owned = {v for v in needed[h] if owner[v] == h}
        fetch = {v: owner[v] for v in needed[h] if owner[v] != h}
        plans.append(HostPlan(
            host_id=h,
            block_indices=assign[h],
            ref_views=refs[h],
            needed_views=needed[h],
            owned_views=owned,
            fetch_views=fetch,
        ))
    return plans


def exchange_cost(plans: Sequence[HostPlan]) -> int:
    """Total number of cross-host depth-map transfers (DCN traffic proxy)."""
    return sum(len(p.fetch_views) for p in plans)


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """jax.distributed.initialize wrapper -> (process_id, num_processes).

    No-op single-process fallback when no coordinator is configured.
    """
    import jax

    if coordinator is None:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()
