"""Quantify cross-device traffic of the sharded PPO train step vs mesh size.

VERDICT r3 weak #4: the 8-device virtual-CPU scaling table's aggregate
drops 43% from 1->8 devices; is that real collective/replication overhead
growing with the mesh, or shared-core contention? This script compiles the
FULL train iteration over data meshes of increasing size and reports, per
mesh size, every collective in the compiled HLO with its payload bytes.

Usage: python scripts/collective_bytes.py [envs_per_device] [out.json]
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
jax.config.update("jax_platforms", "cpu")

from handarm_tpu.utils.jaxinit import setup_cache

setup_cache()

DT_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
            "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}
SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|pred|s8|u8)\[([0-9,]*)\]")
COLL_RE = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
)


def shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(sig):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def analyze(n_devices: int, envs_per_device: int) -> dict:
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv
    from handarm_tpu.learn.ppo import PPO, PPOConfig
    from handarm_tpu.parallel.mesh import make_mesh, shard_train_state

    mesh = make_mesh(n_devices)
    num_envs = envs_per_device * n_devices
    env = HandArmEnv(HandArmConfig(
        num_envs=num_envs, episode_length=25, solver_iterations=8))
    ppo = PPO(env, PPOConfig(horizon=16, minibatch_size=num_envs * 4,
                             mini_epochs=4, hidden=(768, 512, 256),
                             data_shards=n_devices))
    ts = ppo.init(jax.random.PRNGKey(0))
    ts = shard_train_state(mesh, ts)
    ctx = (jax.sharding.use_mesh(mesh)
           if hasattr(jax.sharding, "use_mesh") else mesh)
    with ctx:
        compiled = jax.jit(ppo.train_iter).lower(ts).compile()
    colls = {}
    for line in compiled.as_text().splitlines():
        m = COLL_RE.search(line)
        if m and "=" in line:
            kind = m.group(1)
            out_sig = line.split("=")[1].split(m.group(1))[0]
            b = shape_bytes(out_sig)
            k = f"{kind}"
            if k not in colls:
                colls[k] = {"count": 0, "bytes": 0}
            colls[k]["count"] += 1
            colls[k]["bytes"] += b
    total = sum(v["bytes"] for v in colls.values())
    return dict(devices=n_devices, num_envs=num_envs, collectives=colls,
                total_collective_bytes=total)


def main():
    epd = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    out = sys.argv[2] if len(sys.argv) > 2 else None
    rows = []
    for n in (1, 2, 4, 8):
        r = analyze(n, epd)
        print(json.dumps(r), flush=True)
        rows.append(r)
    report = dict(
        envs_per_device=epd,
        rows=rows,
        note=(
            "bytes are per-program (per-device) collective payload sizes "
            "summed over the compiled train_iter HLO; if these stay ~flat "
            "with mesh size, scaling losses on the shared-core virtual CPU "
            "mesh are host contention, not communication growth"
        ),
    )
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
