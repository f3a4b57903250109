"""Native (C++) kernels shipped with the package.

`novelty.cpp` — Horn-quaternion Kabsch + TM/GDT novelty scan (C ABI,
loaded via ctypes by `tpu_diffusion.protein.novelty`). Compiled by
setup.py at build time, or by g++ on first import as a fallback.
"""
