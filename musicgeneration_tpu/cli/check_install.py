"""Environment sanity check (reference tools/check_install.py parity).

    python -m musicgeneration_tpu.cli.check_install

Reports: package imports, JAX backend + device inventory, native SMF
library availability (and a build attempt), and a tiny jit smoke test.
Exit code 0 = usable install.
"""

from __future__ import annotations

import importlib
import sys


def main(argv=None) -> int:
    ok = True

    for mod in ("numpy", "jax", "flax", "optax"):
        try:
            m = importlib.import_module(mod)
            print(f"[x] {mod} {getattr(m, '__version__', '?')}")
        except ImportError as e:
            print(f"[ ] {mod}: {e}")
            ok = False

    try:
        import jax

        devices = jax.devices()
        print(f"[x] jax backend={jax.default_backend()} "
              f"devices={len(devices)} ({devices[0].platform})")
        import jax.numpy as jnp

        out = jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((128, 128)))
        print(f"[x] jit smoke test: {float(out):.0f}")
    except Exception as e:  # noqa: BLE001
        print(f"[ ] jax device/jit check failed: {e}")
        ok = False

    try:
        import musicgeneration_tpu
        from musicgeneration_tpu import native

        print(f"[x] musicgeneration_tpu {musicgeneration_tpu.__version__}")
        if native.available():
            print("[x] native SMF scanner (libmgsmf.so)")
        else:
            print("[ ] native SMF scanner not built "
                  "(make -C musicgeneration_tpu/native); pure-Python "
                  "fallback active")
    except Exception as e:  # noqa: BLE001
        print(f"[ ] package import failed: {e}")
        ok = False

    try:
        from musicgeneration_tpu.models.registry import registered_models

        print(f"[x] registered models: {', '.join(registered_models())}")
    except Exception as e:  # noqa: BLE001 — diagnostics must not crash
        print(f"[ ] model registry import failed: {e}")
        ok = False

    try:
        import jax

        if jax.default_backend() == "tpu":
            import jax.numpy as jnp

            from musicgeneration_tpu.ops.pallas_attention import (
                fused_relative_attention,
            )

            ks = jax.random.split(jax.random.PRNGKey(0), 4)
            q, k, v = (jax.random.normal(ks[i], (1, 1, 128, 64))
                       for i in range(3))
            e = jax.random.normal(ks[3], (128, 64))
            out = fused_relative_attention(q, k, v, e)
            assert bool(jnp.isfinite(out).all())
            print("[x] pallas fused attention compiles on TPU")
    except Exception as e:  # noqa: BLE001
        print(f"[ ] pallas kernel check failed: {e}")
        ok = False
    print("OK" if ok else "PROBLEMS FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
