"""Environment report for run logs (reference utils/collect_env.py —
torch's get_pretty_env_info + Pillow; the TPU-native report covers the
JAX/XLA stack and device topology instead)."""

from __future__ import annotations

import os
import platform
import sys


def collect_env_info() -> str:
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        try:
            import jaxlib

            lines.append(f"jaxlib: {jaxlib.__version__}")
        except Exception:
            pass
        devs = jax.devices()
        kinds: dict = {}
        for d in devs:
            kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
        lines.append(
            "devices: "
            + ", ".join(f"{n}x {k}" for k, n in sorted(kinds.items()))
            + f" (process {jax.process_index()}/{jax.process_count()})"
        )
        lines.append(f"default backend: {jax.default_backend()}")
    except Exception as e:  # pragma: no cover - jax is baked in
        lines.append(f"jax: unavailable ({e})")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib

            m = importlib.import_module(mod)
            lines.append(f"{mod}: {getattr(m, '__version__', '?')}")
        except Exception:
            pass
    xla_flags = os.environ.get("XLA_FLAGS")
    if xla_flags:
        lines.append(f"XLA_FLAGS: {xla_flags}")
    libtpu = os.environ.get("LIBTPU_INIT_ARGS")
    if libtpu:
        lines.append(f"LIBTPU_INIT_ARGS: {libtpu}")
    return "\n".join(lines)
