from .points import (
    ball_query,
    farthest_point_sampling,
    index_points,
    knn_points,
    square_distance,
)
from .sampling import grid_sample_points, pixel_to_grid
