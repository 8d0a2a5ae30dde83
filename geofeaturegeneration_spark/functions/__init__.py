from geofeaturegeneration_spark.functions.grid import (
    cantor_pair,
    cantor_unpair_x,
    cantor_unpair_y,
    gps_to_loncol,
    gps_to_latcol,
    grid_to_centre_lon,
    grid_to_centre_lat,
    in_bounds,
)
from geofeaturegeneration_spark.functions.timefeat import (
    time_features,
    event_time_from_position,
)

__all__ = [
    "cantor_pair",
    "cantor_unpair_x",
    "cantor_unpair_y",
    "gps_to_loncol",
    "gps_to_latcol",
    "grid_to_centre_lon",
    "grid_to_centre_lat",
    "in_bounds",
    "time_features",
    "event_time_from_position",
]
