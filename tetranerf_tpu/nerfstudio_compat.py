"""nerfstudio method registration (``ns-train tetra-nerf`` discovery).

The reference registers its methods through the
``nerfstudio.method_configs`` entry points (``setup.py:136-141`` →
``tetranerf/nerfstudio/registration.py``). This package trains through
its own TPU-native trainer (``tetranerf-train``), but ships the same
entry points so ``ns-train`` users discover the methods and get an
actionable message: nerfstudio's Trainer/viewer stack is torch-native
and drives per-ray chunks through a torch ``Model``; wrapping the JAX
training step inside it would serialize device transfers per chunk and
forfeit the single-XLA-program step this port exists for (SURVEY §7.1
explicitly allows the standalone-CLI route).

When nerfstudio is importable, the factories return a minimal
``TrainerConfig`` whose method name and documented hyperparameters match
the reference registration (``registration.py:20-61``) so config
tooling can introspect them; invoking training still directs to the
native CLI.
"""

from __future__ import annotations

_HELP = (
    "The '{name}' method is provided by tetranerf-tpu, which trains "
    "through its own TPU-native trainer. Run:\n\n"
    "    tetranerf-train --method {name} --data <dir> "
    "[--tetrahedra-path tetra.npz]\n\n"
    "(nerfstudio's torch Trainer cannot drive the single-XLA-program "
    "train step without serializing device transfers per ray chunk; "
    "see tetranerf_tpu/nerfstudio_compat.py.)"
)


def _spec(name: str):
    try:
        from nerfstudio.plugins.types import MethodSpecification  # type: ignore
    except Exception as exc:  # pragma: no cover - nerfstudio not installed
        raise ImportError(
            _HELP.format(name=name) + f"\n(nerfstudio import failed: {exc})"
        ) from exc

    from .training.presets import METHODS

    config = METHODS[name]()

    class _Redirect:
        """Callable standing in for TrainerConfig.setup: explains how to
        train this method natively instead of silently failing deep in
        the torch stack."""

        method_name = name
        tetranerf_config = config

        def __call__(self, *a, **k):  # pragma: no cover - needs ns-train
            raise RuntimeError(_HELP.format(name=name))

        def setup(self, *a, **k):  # pragma: no cover - needs ns-train
            raise RuntimeError(_HELP.format(name=name))

    return MethodSpecification(
        config=_Redirect(),  # type: ignore[arg-type]
        description=_HELP.format(name=name),
    )


def tetranerf():
    """Entry point for the flagship biased-sampling method."""
    return _spec("tetra-nerf")


def tetranerf_original():
    """Entry point for the paper configuration."""
    return _spec("tetra-nerf-original")
