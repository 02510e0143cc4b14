from setuptools import setup, find_packages

setup(
    name="go2_rl_gym_tpu",
    version="0.4.0",
    description="TPU-native Go2 quadruped locomotion RL framework (JAX/XLA/Pallas)",
    packages=find_packages(include=["go2_rl_gym_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint",
                      "chex", "numpy", "pyyaml"],
)
