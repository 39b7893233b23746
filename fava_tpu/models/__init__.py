from fava_tpu.models.model import Model
from fava_tpu.models.flash import FLASH, FileSubStem, FileType

__all__ = ["Model", "FLASH", "FileSubStem", "FileType"]
