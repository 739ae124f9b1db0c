from setuptools import find_packages, setup

setup(
    name="femo_alpha_tpu",
    version="0.1.0",
    description=(
        "TPU-native differentiable FEM + adjoint-optimization framework "
        "(capability parity with LSDOlab/femo_alpha)"
    ),
    packages=find_packages(include=["femo_alpha_tpu", "femo_alpha_tpu.*"]),
    package_data={"femo_alpha_tpu.native": ["meshops.cpp"]},
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "scipy"],
)
