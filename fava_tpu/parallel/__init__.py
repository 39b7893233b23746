from fava_tpu.parallel.runtime import (
    SNAP_AXIS,
    SPACE_AXIS,
    block_sharding,
    device_count,
    get_mesh,
    make_device_mesh,
    replicated,
    set_mesh,
    shard_volume,
    use_mesh,
    volume_sharding,
)
from fava_tpu.parallel.fft import pfft3

__all__ = [
    "SNAP_AXIS",
    "SPACE_AXIS",
    "block_sharding",
    "device_count",
    "get_mesh",
    "make_device_mesh",
    "pfft3",
    "replicated",
    "set_mesh",
    "shard_volume",
    "use_mesh",
    "volume_sharding",
]
