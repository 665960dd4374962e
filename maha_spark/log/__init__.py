from .request_log import (  # noqa: F401
    CollectingRequestLogWriter,
    JsonlRequestLogWriter,
    MultiRequestLogWriter,
    NoopRequestLogWriter,
    RequestLogEntry,
    build_log_entry,
)
