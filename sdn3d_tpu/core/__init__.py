from sdn3d_tpu.core.config import (
    DerenderConfig,
    RasterizerConfig,
    RenderConfig,
)
