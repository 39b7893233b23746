from fava_tpu.ops import flame, fractal, profiles, regrid, spectra, structure, volume

__all__ = ["flame", "fractal", "profiles", "regrid", "spectra", "structure", "volume"]
