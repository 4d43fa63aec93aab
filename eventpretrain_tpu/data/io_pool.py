"""Thread-pool parallel sample loading for the host pipelines.

The reference overlaps file IO with compute via DataLoader worker
*processes* (main_pretrain.py:236-243 ``--num_workers``). Here sources'
``load(index)`` is plain numpy/file IO that releases the GIL in the read
and decompress paths, so worker *threads* suffice — no pickling, no
per-worker dataset copies, shared page cache. Determinism is preserved by
construction: only the (rng-free) ``load`` calls run on the pool; every
RNG draw stays on the pipeline thread in index order, so the random
stream is identical to the sequential path.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence


def make_pool(num_workers: int) -> Optional[ThreadPoolExecutor]:
    """None for sequential loading; idle pool threads exit when the
    executor is garbage collected, so per-epoch pipelines may own one."""
    if num_workers <= 0:
        return None
    return ThreadPoolExecutor(
        max_workers=num_workers, thread_name_prefix="evp-load"
    )


def map_loads(
    load: Callable[[int], object],
    indices: Sequence,
    pool: Optional[ThreadPoolExecutor],
) -> list:
    """``[load(i) for i in indices]``, fanned over the pool when present.

    Results come back in index order either way; ``load`` must be free of
    shared-RNG draws (sources derive any per-sample randomness from
    (seed, index, visit) instead — see EFImageNetSource.load).
    """
    if pool is None:
        return [load(int(i)) for i in indices]
    return list(pool.map(lambda i: load(int(i)), indices))
