"""Pure data kernels: no Ray imports here, so they are cheap to ship to workers."""
