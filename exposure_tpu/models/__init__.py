from exposure_tpu.models.networks import CriticNet, FeatureExtractor, PolicyNet
from exposure_tpu.models.agent import (
    AgentStepOutput,
    agent_step,
    enrich_image_input,
    initial_states,
)
