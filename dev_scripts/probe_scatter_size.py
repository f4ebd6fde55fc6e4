"""Is TPU scatter-add per-row cost TABLE-SIZE-bound (like the gather)?

4.2M training split: pts-grad = 46.8 ms of the 68.4 ms step, and the
same scatter at 1M tables cost 19.2 ms — per-row cost seems to scale
with table bytes. If scatter into a SMALL table is much cheaper, a
batch-dedup transpose pays: remap the batch's ~196k rows to compact
ranks (sorted distinct ids, ~60-100k per 1024-ray batch at 4.2M),
scatter-add cotangents into the compact f32 table, then ONE small
scatter of the aggregated rows into the big table.

Measures zeros((M,42)).at[idx].add(rows) for 196k rows across table
sizes M, f32 and bf16, plus the candidate two-stage pipeline.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ROWS = 196_608          # 1024 rays x SR24 x K8
C = 42
rng = np.random.default_rng(0)


def timeit(fn, args_list, iters=12, tag=""):
    _ = jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    outs = [fn(*args_list[k % 3]) for k in range(iters)]
    for o in outs:
        jax.block_until_ready(o)
    # force a real transfer (block_until_ready unreliable through axon)
    _ = [float(jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))
         for o in outs[-2:]]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)
    return dt


rows_list = [jnp.asarray(rng.normal(size=(ROWS, C)).astype(np.float32))
             for _ in range(3)]
rows_bf = [r.astype(jnp.bfloat16) for r in rows_list]

for M in (4_200_000, 1_000_000, 262_144, 65_536):
    # realistic duplicate structure: ~80 distinct ids per 192-row ray
    ids = []
    for k in range(3):
        per_ray = rng.integers(0, M, size=(1024, 80))
        pick = rng.integers(0, 80, size=(1024, 192))
        ids.append(jnp.asarray(
            np.take_along_axis(per_ray, pick, 1).reshape(-1).astype(
                np.int32)))

    @jax.jit
    def scat_f32(idx, r):
        return jnp.zeros((M, C), jnp.float32).at[idx].add(r)

    @jax.jit
    def scat_bf16(idx, r):
        return jnp.zeros((M, C), jnp.bfloat16).at[idx].add(r)

    timeit(scat_f32, list(zip(ids, rows_list)), tag=f"f32  M={M:8d}")
    timeit(scat_bf16, list(zip(ids, rows_bf)), tag=f"bf16 M={M:8d}")

# candidate two-stage transpose at 4.2M: sort -> distinct ranks ->
# compact f32 scatter -> one small scatter into the big bf16 table
M = 4_200_000
U_CAP = 131_072
ids = []
for k in range(3):
    per_ray = rng.integers(0, M, size=(1024, 80))
    pick = rng.integers(0, 80, size=(1024, 192))
    ids.append(jnp.asarray(
        np.take_along_axis(per_ray, pick, 1).reshape(-1).astype(np.int32)))


@jax.jit
def two_stage(idx, r):
    s = jnp.sort(idx)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    rank_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1      # (ROWS,)
    n_uniq = rank_sorted[-1] + 1
    # uniq id at each rank (scatter the sorted ids at their ranks)
    uniq = jnp.zeros((U_CAP,), jnp.int32).at[
        jnp.clip(rank_sorted, 0, U_CAP - 1)].set(s, mode="drop")
    # rank of each ORIGINAL row: searchsorted over the uniq prefix
    rank = jnp.searchsorted(jnp.where(
        jnp.arange(U_CAP) < n_uniq, uniq, M + 1), idx)
    compact = jnp.zeros((U_CAP, C), jnp.float32).at[
        jnp.clip(rank, 0, U_CAP - 1)].add(r, mode="drop")
    big = jnp.zeros((M, C), jnp.bfloat16).at[
        jnp.clip(uniq, 0, M - 1)].add(
        jnp.where((jnp.arange(U_CAP) < n_uniq)[:, None],
                  compact, 0.0).astype(jnp.bfloat16), mode="drop")
    return big, n_uniq


d = timeit(two_stage, list(zip(ids, rows_list)), tag="two_stage 4.2M")
print("n_uniq sample:", int(two_stage(ids[0], rows_list[0])[1]), flush=True)
