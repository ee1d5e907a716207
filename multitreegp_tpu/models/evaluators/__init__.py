from .sr import SREvaluator, generate_sr_data
from .static_policy import StaticPolicyEvaluator
from .dynamic_policy import DynamicPolicyEvaluator


def generate_control_data(env, key, ts, batch_size, param_mode="Constant"):
    """Sample a control task batch: the role of the notebooks' get_data
    (StaticPolicy.ipynb cell 2). Returns the evaluator data tuple
    (x0, ts, targets, process_noise_keys, obs_noise_keys, params)."""
    import jax.random as jr

    init_key, noise1, noise2, param_key = jr.split(key, 4)
    x0, targets = env.sample_init_states(batch_size, init_key)
    process_noise_keys = jr.split(noise1, batch_size)
    obs_noise_keys = jr.split(noise2, batch_size)
    params = env.sample_params(batch_size, param_mode, ts, param_key)
    params = env.prepare_params(params, ts)
    return x0, ts, targets, process_noise_keys, obs_noise_keys, params
