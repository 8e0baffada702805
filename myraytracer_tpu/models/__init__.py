from myraytracer_tpu.models.camera import Camera
from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.light import Light
from myraytracer_tpu.models.mesh import TriangleMesh
from myraytracer_tpu.models.scene import Scene, SceneData
