"""Service-layer exception types (the common_exceptions analogs, reference
src/service/common_exceptions.hpp usage throughout src/service/)."""


class ObjectNotFoundException(KeyError):
    pass


class ObjectAlreadyExistsException(ValueError):
    pass


class ResourceLockedException(RuntimeError):
    pass


class InvalidTokenException(PermissionError):
    pass
