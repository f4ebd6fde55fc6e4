from .options import (BaseOptions, TrainOptions, TestOptions, EditOptions,
                      configs_from_opt)
