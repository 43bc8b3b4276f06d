from .witness import Generator, LambdaGenerator, generate_witness  # noqa: F401
