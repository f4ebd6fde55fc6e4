from .pointcloud import NeuralPointCloudEdit
from .editor import (crop_point_cloud, add_point_cloud,
                     transform_point_cloud_global,
                     transform_point_cloud_local)
