from herdsman_tpu.service.errors import (  # noqa: F401
    ObjectAlreadyExistsException,
    ObjectNotFoundException,
    ResourceLockedException,
)
from herdsman_tpu.service.config import Config, load_config  # noqa: F401
from herdsman_tpu.service.session import SessionService  # noqa: F401
from herdsman_tpu.service.keystore import KeyService  # noqa: F401
from herdsman_tpu.service.storage import StorageService  # noqa: F401
from herdsman_tpu.service.execution import (  # noqa: F401
    ExecutionService,
    JobStatus,
)
from herdsman_tpu.service.auth import AuthService  # noqa: F401
from herdsman_tpu.service.coordinator import Coordinator  # noqa: F401
