from .aot import (
    compile_inference,
    export_serialized,
    load_serialized,
    lower_inference,
)

__all__ = [
    "compile_inference",
    "export_serialized",
    "load_serialized",
    "lower_inference",
]
