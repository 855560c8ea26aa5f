from .rollout_kernel import (terrain_rollout_costs_pallas,
                             pallas_rollout_supported)

__all__ = ["terrain_rollout_costs_pallas", "pallas_rollout_supported"]
