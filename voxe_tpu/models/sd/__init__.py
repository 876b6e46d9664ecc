from voxe_tpu.models.sd.config import (  # noqa: F401
    SD_VERSIONS,
    CLIPTextConfig,
    SDConfig,
    UNetConfig,
    VAEConfig,
    tiny_test_config,
)
from voxe_tpu.models.sd.scheduler import DDIMScheduler  # noqa: F401
from voxe_tpu.models.sd.sds import (  # noqa: F401
    StableDiffusion,
    scoreDistillationLoss,
    specify_gradient,
)
