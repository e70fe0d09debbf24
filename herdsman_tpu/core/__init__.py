from herdsman_tpu.core.params import (  # noqa: F401
    TFHEParams,
    TOY,
    TEST_SMALL,
    TEST_PBS,
    STD128,
    PARAM_SETS,
)
