from setuptools import find_packages, setup

setup(
    name="ipcgen_tpu",
    version="0.1.0",
    description=(
        "TPU-native framework for controllable generation of indoor "
        "mobile-robot LiDAR point-cloud datasets"
    ),
    packages=find_packages(include=["ipcgen_tpu", "ipcgen_tpu.*"]),
    python_requires=">=3.10",
)
