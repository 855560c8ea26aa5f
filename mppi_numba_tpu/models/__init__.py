"""Pluggable dynamics models.

The reference hard-codes the unicycle Euler update inside every CUDA kernel
because Numba cannot dispatch through objects on device (reference:
mppi_numba/mppi.py:6-7, 677-694).  Here a model is a pure step function

    step(x, y, th, v, w, lin_traction, ang_traction, dt) -> (x, y, th)

over batched arrays, selected by name via ``SolverStatic.model`` (names keep
the jit cache key hashable).  Step functions are pure elementwise jnp, so
they trace directly into the fused Pallas rollout kernels as well as the
XLA path; only the ``fast_trig`` rotation shortcut is unicycle-specific
(other models use exact trig inside the kernel).
"""

from __future__ import annotations

from .unicycle import unicycle_step, clip_controls
from .bicycle import bicycle_step, make_bicycle_step

_REGISTRY = {
    "unicycle": unicycle_step,
    "bicycle": bicycle_step,
}

# Models whose per-step translation is bounded by ``dt * lin_traction * v``
# (both built-ins scale translation that way).  The planner's
# reachable-window (ROI) crop sizes its window from that bound, so it only
# activates for models in this set.
_UNICYCLE_DISPLACEMENT_BOUNDED = {"unicycle", "bicycle"}


def register_model(name, step_fn, displacement_bounded=False):
    """Register a custom dynamics step function under ``name``.

    Pass ``displacement_bounded=True`` iff the model's per-step translation
    never exceeds ``dt * lin_traction * |v|`` — this opts the model into
    the planner's reachable-window map cropping (otherwise cropping is
    disabled for it, trading speed for safety on large maps).
    """
    _REGISTRY[name] = step_fn
    if displacement_bounded:
        _UNICYCLE_DISPLACEMENT_BOUNDED.add(name)
    else:
        _UNICYCLE_DISPLACEMENT_BOUNDED.discard(name)


def has_displacement_bound(name):
    """Whether the ROI crop's reach bound is valid for this model."""
    return name in _UNICYCLE_DISPLACEMENT_BOUNDED


def get_step_fn(name):
    """Resolve a registered model name to its step function."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError("unknown dynamics model {!r}; registered: {}".format(
            name, sorted(_REGISTRY))) from None


__all__ = ["unicycle_step", "clip_controls", "bicycle_step",
           "make_bicycle_step", "register_model", "get_step_fn",
           "has_displacement_bound"]
