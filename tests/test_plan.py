"""ExecutionPlan model, reduce-tree shapes, and partition formula tests —
encoding the reference's behavioral contracts (SURVEY.md §4)."""

import uuid

import pytest

from herdsman_tpu.circuit import (
    CircuitBuilder,
    ColumnMeta,
    DataType,
    ExecutionPlan,
    InputStage,
    MapperStage,
    MappingError,
    OutputStage,
    Policy,
    ReduceStage,
    SchemaType,
)
from herdsman_tpu.circuit.dag import DAG
from herdsman_tpu.compiler.reduce_tree import build_reduce_tree
from herdsman_tpu.compiler.stages import partition_sizes


def bit_identity_circuit():
    b = CircuitBuilder([ColumnMeta("v", DataType.BIT)])
    b.output("v", ~(~b.input_bit("v")))
    return b.build()


def make_plan(frame_uuid=None):
    g = DAG()
    frame_uuid = frame_uuid or str(uuid.uuid4())
    inp = g.emplace(InputStage(frame_uuid))
    mp = g.emplace(MapperStage(bit_identity_circuit()))
    out = g.emplace(OutputStage("result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, out)
    return ExecutionPlan(SchemaType.TFHE_BOOL, g)


def test_partition_sizes_formula():
    # reference src/service/storage_service.cpp:121-147, 321-332:
    # rows//parts, first rows%parts partitions get +1
    assert partition_sizes(10, 3) == [4, 3, 3]
    assert partition_sizes(9, 3) == [3, 3, 3]
    assert partition_sizes(7, 4) == [2, 2, 2, 1]
    assert partition_sizes(1, 1) == [1]
    assert partition_sizes(5, 5) == [1, 1, 1, 1, 1]


def test_plan_validate_ok():
    make_plan().validate()


def test_plan_serde_roundtrip():
    plan = make_plan()
    plan2 = ExecutionPlan.from_json(plan.to_json())
    assert plan2.schema_type == plan.schema_type
    assert len(plan2.execution_graph) == len(plan.execution_graph)
    kinds = [type(n.value).__name__ for n in plan2.execution_graph]
    assert kinds == ["InputStage", "MapperStage", "OutputStage"]


def test_plan_validation_errors():
    # mapper with no parent
    g = DAG()
    g.emplace(MapperStage(bit_identity_circuit()))
    with pytest.raises(MappingError):
        ExecutionPlan(SchemaType.TFHE_BOOL, g).validate()
    # input with a parent
    g = DAG()
    a = g.emplace(InputStage(str(uuid.uuid4())))
    b = g.emplace(InputStage(str(uuid.uuid4())))
    g.add_edge(a, b)
    with pytest.raises(MappingError):
        ExecutionPlan(SchemaType.TFHE_BOOL, g).validate()
    # empty plan
    with pytest.raises(MappingError):
        ExecutionPlan(SchemaType.TFHE_BOOL, DAG()).validate()
    # cycle
    g = DAG()
    a = g.emplace(MapperStage(bit_identity_circuit()))
    b = g.emplace(MapperStage(bit_identity_circuit()))
    g.add_edge(a, b)
    g.add_edge(b, a)
    with pytest.raises((MappingError, ValueError)):
        ExecutionPlan(SchemaType.TFHE_BOOL, g).validate()
    # bad per_node_count
    g = DAG()
    inp = g.emplace(InputStage(str(uuid.uuid4())))
    cb = CircuitBuilder([ColumnMeta("a", DataType.BIT),
                         ColumnMeta("b", DataType.BIT)])
    cb.output("a", cb.input_bit("a") ^ cb.input_bit("b"))
    rd = g.emplace(ReduceStage(cb.build(), Policy.PARALLEL_FULL,
                               per_node_count=1))
    g.add_edge(inp, rd)
    with pytest.raises(MappingError):
        ExecutionPlan(SchemaType.TFHE_BOOL, g).validate()


# --- reduce trees (reference src/service/execution_service.cpp:560-688) ---

def test_reduce_tree_sequenced():
    t = build_reduce_tree([2, 2, 1], Policy.SEQUENCED)
    # 3 input nodes + 1 output task
    assert len(t.tree) == 4
    assert t.total_tasks() == 1
    assert t.initial_pending == [t.output_node]
    out = t.tree[t.output_node]
    assert out.value.unresolved_dependencies == 3
    assert len(out.parents()) == 3


def test_reduce_tree_parallel():
    t = build_reduce_tree([2, 2, 1, 1], Policy.PARALLEL)
    # 4 inputs + 4 intermediates + 1 output
    assert len(t.tree) == 9
    assert t.total_tasks() == 5
    assert len(t.initial_pending) == 4
    assert t.hidden_frame_rows == 4
    # completing all intermediates releases the output exactly once
    released = []
    for nid in t.initial_pending:
        released.extend(t.mark_completed(nid))
    assert released == [t.output_node]


def test_reduce_tree_parallel_full_binary():
    # 5 partitions, k=2: leaves 5 -> merge 2+promote1 -> 3 -> merge 1+promote1
    # -> 2 -> output consumes 2
    t = build_reduce_tree([1] * 5, Policy.PARALLEL_FULL, per_node_count=2)
    # node_sum per reference loop: c=5,sum=5; c=2+1=3,sum=8; c=1+1=2,sum=10
    assert t.hidden_frame_rows == 10
    # nodes: 5 inputs + 5 leaves + 2 merges + 1 merge + 1 output = 14
    assert len(t.tree) == 14
    assert t.total_tasks() == 9
    assert len(t.initial_pending) == 5
    out = t.tree[t.output_node]
    assert out.value.unresolved_dependencies == 2


def test_reduce_tree_parallel_full_kary():
    t = build_reduce_tree([1] * 9, Policy.PARALLEL_FULL, per_node_count=3)
    # reference node_sum loop: c=9,sum=9; c=3+0=3,sum=12 -> stop (3 <= 3)
    assert t.hidden_frame_rows == 12
    # 9 inputs + 9 leaves + 3 merges + 1 output
    assert len(t.tree) == 22
    assert t.total_tasks() == 13
    out = t.tree[t.output_node]
    assert out.value.unresolved_dependencies == 3


def test_reduce_tree_release_order():
    t = build_reduce_tree([1] * 4, Policy.PARALLEL_FULL, per_node_count=2)
    # leaves 4 -> 2 merges -> output(2 deps)
    ready = list(t.initial_pending)
    done = set()
    executed = []
    while ready:
        nid = ready.pop(0)
        executed.append(nid)
        done.add(nid)
        ready.extend(t.mark_completed(nid))
    assert t.output_node in done
    assert len(executed) == t.total_tasks()
    # every node executes after all its task parents
    for nid in executed:
        for p in t.tree[nid].parents():
            if p.value.is_task:
                assert executed.index(p.node_id()) < executed.index(nid)
