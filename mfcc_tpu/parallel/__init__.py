from .sharding import (  # noqa: F401
    make_mesh, shard_streams, mfcc_sharded_fn, streaming_sharded_fn,
)
from .halo import mfcc_halo_fn, pad_for_halo  # noqa: F401
