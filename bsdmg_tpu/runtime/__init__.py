from bsdmg_tpu.runtime.native import (
    native_available,
    weld_vertices_native,
    write_obj_native,
)

__all__ = ["native_available", "weld_vertices_native", "write_obj_native"]
