from .mesh import Mesh  # noqa: F401
from .material import Material  # noqa: F401
from .camera import Camera  # noqa: F401
from .instance import Instance  # noqa: F401
from .scene import Scene, SceneBackground  # noqa: F401
