from fava_tpu.io import flash_file, synthetic
from fava_tpu.io.flash_file import FIELD_MAPPING, MESH_MDIM, NGUARD

__all__ = ["flash_file", "synthetic", "FIELD_MAPPING", "MESH_MDIM", "NGUARD"]
