from .scene_model import SceneModel
