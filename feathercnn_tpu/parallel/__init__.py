from .mesh import (ShardingConfig, build_mesh, input_shardings,
                   output_shardings, param_shardings)

__all__ = ["ShardingConfig", "build_mesh", "input_shardings",
           "output_shardings", "param_shardings"]
