from herdsman_tpu.circuit.dag import DAG  # noqa: F401
from herdsman_tpu.circuit.model import (  # noqa: F401
    Circuit,
    ColumnMeta,
    DataType,
    GateOp,
    GateNode,
    MappingError,
    OutputColumn,
    SchemaType,
)
from herdsman_tpu.circuit.plan import (  # noqa: F401
    ExecutionPlan,
    InputStage,
    MapperStage,
    OutputStage,
    Policy,
    ReduceStage,
)
from herdsman_tpu.circuit.builder import CircuitBuilder  # noqa: F401
