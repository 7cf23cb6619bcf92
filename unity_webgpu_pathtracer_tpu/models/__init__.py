"""Example scenes mirroring the reference's ``Assets/Examples/Scenes``."""

from unity_webgpu_pathtracer_tpu.models.cornell import cornell_box  # noqa: F401
from unity_webgpu_pathtracer_tpu.models import primitives  # noqa: F401
