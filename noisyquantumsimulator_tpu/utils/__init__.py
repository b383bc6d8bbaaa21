from .transfer import device_get_complex, device_put_complex  # noqa: F401
