from herdsman_tpu.compiler.lower import (  # noqa: F401
    compile_circuit,
    evaluate_plain,
    levelize,
)
