from .sharding import (  # noqa: F401
    make_mesh, shard_streams, mfcc_sharded_fn, streaming_sharded_fn,
)
