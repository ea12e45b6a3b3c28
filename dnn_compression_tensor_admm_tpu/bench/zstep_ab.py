"""Z-step layer-sharding A/B: admm_update with and without the 'layer'
mesh axis.

The reference runs every layer's projection serially on the host CPU
(admm.py:50-67); here the projection buckets are vmapped on device, and
with a mesh the [L, ...] layer stacks shard over the 'layer' axis
(north-star design, SURVEY.md §5). This harness times one jitted
admm_update, replicated vs layer-sharded, on whatever devices exist —
the virtual CPU mesh gives indicative (CPU-core-backed) numbers; the
ratio is the artifact.

Run: DCTA_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python -m dnn_compression_tensor_admm_tpu.bench.zstep_ab [n_layer ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial


def measure(n_layer: int, model: str = "resnet32", fmt: str = "tk",
            ratio: str = "3", iters: int = 5, method: str = "subspace") -> dict:
    import jax
    import jax.numpy as jnp
    from ..admm import admm_init, admm_update, build_program
    from ..configs.resolver import get_rank_plan
    from ..models import create_model
    from ..parallel import make_mesh
    from ..utils.profiling import device_sync

    m = create_model(model)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False)
    params = variables["params"]
    plan = get_rank_plan(model, fmt, ratio)
    program = build_program(params, plan)
    state = admm_init(params, program)

    mesh = None
    if n_layer > 1:
        devs = jax.devices()
        if len(devs) < n_layer:
            raise RuntimeError(f"need {n_layer} devices, have {len(devs)}")
        mesh = make_mesh(n_data=1, n_layer=n_layer, devices=devs[:n_layer])

    step = jax.jit(partial(admm_update, program=program, update_u=True,
                           method=method, n_iter=6, mesh=mesh))
    # TWO warmups: the first compiles for the host-resident initial
    # state; its OUTPUT state is mesh-replicated, so feeding it back is a
    # different input sharding and triggers a second compile — which
    # previously landed INSIDE the timed loop and dominated every
    # sharded row (rounds 3-4 measured 0.02-0.2x "scaling" that was
    # ~90% recompilation, not execution; see BENCHNOTES r5)
    new_state, res = step(params, state)
    new_state, res = step(params, new_state)
    device_sync(res)
    t0 = time.perf_counter()
    for _ in range(iters):
        new_state, res = step(params, new_state)
    device_sync(res)
    dt = (time.perf_counter() - t0) / iters
    # analytic work model for the SHARED-CORE virtual mesh: each bucket's
    # [L] stack pads to n*ceil(L/n) solver slots (zero-padding solves run
    # the full solver on zeros), and the virtual mesh serializes total
    # slots over the same host cores, while real hardware pays only the
    # max PER-DEVICE load ceil(L/n). slots_inflation is the padded-work
    # multiplier the virtual measurement carries; real_latency_model is
    # the speedup an n-real-device mesh would see for the solver region
    # (sum L / sum ceil(L/n), weighted by per-layer cost ~ equal within
    # this config's buckets).
    sizes = [len(g.names) for g in program.groups]
    import math
    slots = sum(n_layer * math.ceil(l / n_layer) for l in sizes)
    inflation = slots / sum(sizes)
    real_model = sum(sizes) / sum(math.ceil(l / n_layer) for l in sizes)
    return {"n_layer_shards": n_layer, "method": method,
            "z_step_ms": round(1000 * dt, 2), "layers": len(program.paths),
            "slots_inflation": round(inflation, 3),
            "real_latency_model_x": round(real_model, 2)}


def measure_isolated(n_layer: int, method: str = "ns", layers: int = 32,
                     ch: int = 64, iters: int = 5) -> dict:
    """Time ONLY the shard_map'd local-solve region (one bucket), without
    admm_update's replicated bookkeeping (stack/residual/U arithmetic).
    On a shared-core virtual mesh the replicated work executes once PER
    DEVICE, multiplying its cost n-fold — an artifact real hardware does
    not have (each device owns its cores). This row separates that
    artifact from the solver's own scaling."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..ops.tucker import tucker2_project
    from ..parallel import make_mesh
    from ..utils.profiling import device_sync

    def solve(block):
        return jax.vmap(lambda w: tucker2_project(
            w, ch // 2, ch // 2, n_iter=6, method=method))(block)

    x = jax.random.normal(jax.random.PRNGKey(0), (layers, ch, ch, 3, 3))
    if n_layer == 1:
        f = jax.jit(solve)
        xs = x
    else:
        mesh = make_mesh(n_data=1, n_layer=n_layer,
                         devices=jax.devices()[:n_layer])
        axes = tuple(mesh.shape.keys())
        f = jax.jit(jax.shard_map(solve, mesh=mesh, in_specs=P(axes),
                                  out_specs=P(axes), check_vma=False))
        xs = jax.device_put(x, NamedSharding(mesh, P(axes)))
    y = f(xs)
    device_sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(xs)
    device_sync(y)
    dt = (time.perf_counter() - t0) / iters
    return {"n_layer_shards": n_layer, "method": method, "isolated": True,
            "z_step_ms": round(1000 * dt, 2), "layers": layers}


def main(argv=None):
    if os.environ.get("DCTA_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["DCTA_PLATFORM"])
    argv = list(argv if argv is not None else sys.argv[1:])
    isolate = "--isolate" in argv
    if isolate:
        argv.remove("--isolate")
    methods = ["subspace"]
    if "--methods" in argv:
        i = argv.index("--methods")
        methods = argv[i + 1].split(",")
        del argv[i:i + 2]
    ns = [int(a) for a in argv] or [1, 2, 4, 8]
    if 1 not in ns:
        ns = [1] + ns  # the 'unsharded' baseline must actually be measured
    rows = []
    for method in methods:
        mrows = [(measure_isolated if isolate else measure)(n, method=method)
                 for n in ns]
        base = next(r["z_step_ms"] for r in mrows if r["n_layer_shards"] == 1)
        for r in mrows:
            # on the shared-core virtual CPU mesh the best possible is
            # parity (1.0x); 'ns' (matmul-only, no LAPACK custom calls)
            # is the control separating the CPU-eigh serialization
            # artifact from real sharding overhead (BENCHNOTES r3/r4)
            r["speedup_vs_unsharded"] = round(base / r["z_step_ms"], 3)
            print(json.dumps(r))
        rows.extend(mrows)
    return rows


if __name__ == "__main__":
    main()
