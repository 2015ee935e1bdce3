"""Hardware-free typing tier (component C37).

The reference runs mypy --strict over its package as a test layer that needs
no GPU (``/root/reference/pyproject.toml:36-39`` + ``stubs/triton/**``: the
Triton kernel wiring is exactly the code static typing catches bugs in).
This container ships NO static checker (no mypy/pyright; installs are
forbidden), so the tier is implemented with what IS shipped, strongest first:

1. **mypy --strict**, if importable (config in pyproject ``[tool.mypy]``) —
   used automatically when the environment has it.
2. **typeguard runtime enforcement** otherwise: install the typeguard import
   hook over the package, import every module under instrumentation, then
   drive a real end-to-end inference (pretrain + train + posterior summary +
   save/load) so every annotation on the live path is CHECKED against actual
   values — argument and return types enforced at each call.

The Pallas/custom_vjp modules (``ops/pallas/*``, ``ops/bounds``) are excluded
from instrumentation: typeguard's wrapper replaces ``jax.custom_vjp`` objects
with plain functions, breaking ``defvjp`` at import time. Their public entry
points are still type-checked at the instrumented CALLER boundaries
(attention/head/sit call sites), and their numerics are covered by the
interpret-mode kernel-vs-oracle tests.

Run: ``make typecheck`` (or ``python tools/typecheck.py``).
"""

from __future__ import annotations

import importlib
import os
import pkgutil
import subprocess
import sys

# runnable as ``python tools/typecheck.py`` from anywhere: the package is
# imported from the repo root, not an installed dist
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXCLUDED = (
    "viforsdes_tpu.ops.pallas",  # custom_vjp objects: typeguard wrapper breaks defvjp
    "viforsdes_tpu.ops.bounds",
)


def _mypy_available() -> bool:
    try:
        import mypy  # noqa: F401

        return True
    except ImportError:
        return False


def run_mypy() -> int:
    print("typecheck tier: mypy --strict")
    return subprocess.call(
        [sys.executable, "-m", "mypy", "--strict", "viforsdes_tpu"]
    )


def run_typeguard() -> int:
    print("typecheck tier: typeguard runtime enforcement (mypy not installed)")
    from typeguard.importhook import TypeguardFinder, install_import_hook

    class _Finder(TypeguardFinder):
        # package matching is prefix-based, so exclusions need a finder
        # override — passing a module list to install_import_hook would
        # still instrument everything under "viforsdes_tpu.ops"
        def should_instrument(self, module_name: str) -> bool:
            if module_name.startswith(EXCLUDED):
                return False
            return super().should_instrument(module_name)

    # enumerate modules FIRST (without importing them), then instrument
    import viforsdes_tpu as _pkg_probe  # noqa: F401 — only for __path__

    modules = ["viforsdes_tpu"] + [
        m.name
        for m in pkgutil.walk_packages(_pkg_probe.__path__, prefix="viforsdes_tpu.")
        if not m.name.startswith(EXCLUDED)
    ]
    # purge so the instrumented loader re-executes everything
    for name in list(sys.modules):
        if name == "viforsdes_tpu" or name.startswith("viforsdes_tpu."):
            del sys.modules[name]
    install_import_hook(["viforsdes_tpu"], cls=_Finder)

    # typeguard 2.13 crashes on NamedTuple classes: the generated __new__'s
    # __globals__ lack builtins, so get_type_hints raises NameError('int').
    # Skip those classes; their field types are plain and covered at every
    # instrumented call site that consumes them.
    import inspect

    import typeguard as _tg

    _orig_typechecked = _tg.typechecked

    def _safe_typechecked(func=None, **kwargs):
        if func is None:
            return lambda f: _safe_typechecked(f, **kwargs)
        if (
            inspect.isclass(func)
            and issubclass(func, tuple)
            and hasattr(func, "_fields")
        ):
            return func
        return _orig_typechecked(func, **kwargs)

    _tg.typechecked = _safe_typechecked

    # typeguard 2.13 predates py3.12's ForwardRef._evaluate signature change
    # (recursive_guard became keyword-only); shim its module-level alias
    def _eval_fref(ref, globalns, localns, _guard=frozenset()):
        try:
            return ref._evaluate(globalns, localns, recursive_guard=frozenset())
        except TypeError:
            return ref._evaluate(
                globalns, localns, frozenset(), recursive_guard=frozenset()
            )

    _tg.evaluate_forwardref = _eval_fref

    import jax

    jax.config.update("jax_platforms", "cpu")

    failures = 0
    for name in modules:
        try:
            importlib.import_module(name)
        except Exception as exc:  # noqa: BLE001 — report every module
            failures += 1
            print(f"IMPORT FAIL {name}: {exc!r}")
    print(f"imported {len(modules)} modules under enforcement ({failures} failures)")
    if failures:
        return 1

    # Drive the live path so annotations are enforced against real values:
    # encoder/head/theta-posterior init+apply, pretrain, train steps, ELBO,
    # posterior summary, save/load.
    import numpy as np

    import viforsdes_tpu as vt

    class OU:
        state_dim = 1
        sde_param_dim = 3

        def drift(self, x, p):
            return p[..., 0:1] * (p[..., 1:2] - x)

        def diffusion(self, x, p):
            return p[..., 2:3][..., None]

    obs = vt.Observations(
        times=[0.0, 1.0, 2.0, 3.0], values=[[2.0], [1.5], [0.8], [1.1]]
    )
    posterior = vt.infer(
        OU(),
        obs,
        vt.GaussianObservationLikelihood(variance=0.1),
        vt.Prior(type=vt.PriorType.NORMAL, mean=0.0, std=1.0, dim=3),
        3.0,
        vt.InferenceConfig(
            training=vt.TrainingConfig(
                time_step=0.25, batch_size=8, n_iterations=4
            ),
            encoder=vt.EncoderConfig(
                hidden_dim=32, cond_dim=32, num_heads=4, depth=2
            ),
            head=vt.HeadConfig(hidden_dim=16, num_layers=2),
            sde_param_positive_dims=[0, 2],
            pretrain=vt.PretrainConfig(n_iterations=5, batch_size=16),
            console=vt.Console(enabled=False),
        ),
    )
    summary = posterior.summary(n_samples=20)
    assert np.all(np.isfinite(np.asarray(summary.sde_parameter_mean)))
    posterior.save("/tmp/typecheck_ckpt.npz")
    vt.VariationalPosterior.load(
        "/tmp/typecheck_ckpt.npz", posterior.model, posterior.prior, obs
    )
    print("typecheck drive OK: annotations enforced on the live path")
    return 0


def main() -> int:
    if _mypy_available():
        return run_mypy()
    return run_typeguard()


if __name__ == "__main__":
    raise SystemExit(main())
