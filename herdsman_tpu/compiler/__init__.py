from herdsman_tpu.compiler.lower import (  # noqa: F401
    compile_circuit,
    evaluate_plain,
    levelize,
)
from herdsman_tpu.compiler.optimizer import optimize_circuit  # noqa: F401
