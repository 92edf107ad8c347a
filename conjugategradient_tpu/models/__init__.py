"""Problem families ("models"): the reference's five benchmark workloads and
the BASELINE config ladder, as named, buildable specs."""

from conjugategradient_tpu.models.workloads import (  # noqa: F401
    LADDER,
    WORKLOADS,
    Workload,
    build,
    get,
)
