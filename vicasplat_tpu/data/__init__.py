from .data_module import DataLoaderConfig, DataModule  # noqa: F401
from .dataset_re10k import DatasetRE10k, DatasetRE10kConfig  # noqa: F401
from .view_samplers import (  # noqa: F401
    ViewSamplerAllConfig,
    ViewSamplerArbitraryConfig,
    ViewSamplerBoundedConfig,
    ViewSamplerEvaluationConfig,
    ViewSamplerSequentialConfig,
    make_view_sampler,
)
