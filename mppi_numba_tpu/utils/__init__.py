from .angles import normalize_angle, normalize_angle_np

__all__ = ["normalize_angle", "normalize_angle_np"]
