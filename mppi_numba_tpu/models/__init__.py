from .unicycle import unicycle_step, clip_controls

__all__ = ["unicycle_step", "clip_controls"]
