"""CLI: python -m l2hmc_tpu [group=U1|SU3] [key=value ...]

Mirrors the reference's hydra-style override UX
(reference src/l2hmc/__main__.py:262 `main()`), without requiring hydra:
dotted-path overrides into the config dataclasses, e.g.

  python -m l2hmc_tpu dynamics.nchains=1024 steps.nepoch=500 \\
      annealing_schedule.beta_init=4.0 annealing_schedule.beta_final=6.0

  python -m l2hmc_tpu group=SU3 dynamics.latvolume=[4,4,4,4]

Special overrides:
  group=U1|SU3      select the default bundle
  mode=debug        tiny debug run (reference conf/mode/debug.yaml)
  outdir=...        output directory
"""
from __future__ import annotations

import logging
import sys

logging.basicConfig(
    level=logging.INFO,
    format="[%(asctime)s][%(name)s][%(levelname)s] %(message)s",
)

DEBUG_OVERRIDES = [
    "dynamics.nchains=128",
    "dynamics.latvolume=[8, 8]",
    "steps.nera=2",
    "steps.nepoch=10",
    "steps.test=10",
    "steps.log=1",
]


def main(argv=None):
    import os
    _cc = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if _cc:
        # re-point the persistent compile cache at the HOST-KEYED subdir:
        # AOT entries from another machine become clean misses instead of
        # SIGILL/SIGSEGV in the deserializer (utils/compile_cache.py)
        from l2hmc_tpu.utils.compile_cache import configure
        configure(_cc)
    argv = list(argv if argv is not None else sys.argv[1:])
    group = "U1"
    overrides = []
    config_path = None
    skip_next = False
    for i, a in enumerate(argv):
        if skip_next:
            skip_next = False
            continue
        if a.startswith("group="):
            group = a.split("=", 1)[1].upper()
        elif a == "mode=debug":
            overrides.extend(DEBUG_OVERRIDES)
        elif a == "--config":
            config_path = argv[i + 1]
            skip_next = True
        elif a.startswith("--config="):
            config_path = a.split("=", 1)[1]
        elif a.startswith("--"):
            continue
        else:
            overrides.append(a)

    # Honor JAX_PLATFORMS / --xla_force_host_platform_device_count from
    # the environment through the config knobs: TPU plugins can ignore
    # the env vars (the axon plugin does), and running multi-chip
    # configs on a virtual CPU mesh (mesh_shape=[d, l] with
    # JAX_PLATFORMS=cpu) is the documented way to exercise sharded
    # training without a pod (SURVEY.md §4).
    import os as _os
    import re as _re
    if _os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
        m = _re.search(r"host_platform_device_count=(\d+)",
                       _os.environ.get("XLA_FLAGS", ""))
        if m and _os.environ["JAX_PLATFORMS"] == "cpu":
            try:
                jax.config.update("jax_num_cpu_devices", int(m.group(1)))
            except RuntimeError:
                # backend already initialized in this process (in-process
                # main() after other jax work, e.g. from tests): XLA_FLAGS
                # already delivered the device count at init — nothing to
                # change, and changing it now is impossible anyway
                pass

    # x64 must flip before any array is created. Normalize the requested
    # precision through the synonym table so e.g. precision=single/half/
    # bf16 correctly keeps x64 off (ADVICE r1: the old '32'-substring
    # heuristic enabled x64 for any non-'32' spelling).
    from l2hmc_tpu.configs import PRECISIONS
    prec = None
    for o in overrides:
        if o.startswith("precision="):
            prec = PRECISIONS.get(o.split("=", 1)[1].lower(), "float32")
    want_x64 = prec == "float64" or (group == "SU3" and prec is None)
    if want_x64:
        import jax
        jax.config.update("jax_enable_x64", True)

    # Fail fast (instead of hanging forever) when the TPU tunnel is
    # wedged by a stale session — no-op for JAX_PLATFORMS=cpu runs.
    from l2hmc_tpu.utils.backend_guard import ensure_backend
    ensure_backend()

    if config_path is not None:
        from l2hmc_tpu.configs import load_yaml
        from l2hmc_tpu.experiment import Experiment
        cfg = load_yaml(config_path)
        if cfg.dynamics.group == "SU3" and cfg.precision == "float64":
            import jax
            jax.config.update("jax_enable_x64", True)
        ex = Experiment(cfg)
    else:
        from l2hmc_tpu.experiment import build_experiment
        ex = build_experiment(overrides, group=group)
    summary = ex.run()
    print(summary)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
