from .request_log import (  # noqa: F401
    CollectingRequestLogWriter,
    JsonlRequestLogWriter,
    MultiRequestLogWriter,
    NoopRequestLogWriter,
    ProtoRequestLogWriter,
    RequestLogEntry,
    build_log_entry,
    to_proto_bytes,
)
