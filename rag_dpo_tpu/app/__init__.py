from .demo import build_demo_stack, DEMO_CORPUS  # noqa: F401
