from .mesh import make_mesh, replicate, shard_batch  # noqa: F401
from .pp import make_mesh_pipe, pipeline_scan, shard_params_pp  # noqa: F401
from .tp import make_mesh_2d, shard_params_tp  # noqa: F401
from .view_parallel import decoder_forward_view_sharded  # noqa: F401
