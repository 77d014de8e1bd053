from .synthetic import make_sphere_scene, sample_sphere_rays, sphere_ray_targets

__all__ = ["make_sphere_scene", "sample_sphere_rays", "sphere_ray_targets"]
