from fava_tpu.mesh.base import Mesh, Structured, Unstructured
from fava_tpu.mesh.flash_amr import BLOCK_TYPE, FLASH
from fava_tpu.mesh.flash_particles import FlashParticles
from fava_tpu.mesh.flash_uniform import FlashUniform

__all__ = ["Mesh", "Structured", "Unstructured", "FLASH", "BLOCK_TYPE", "FlashParticles", "FlashUniform"]
