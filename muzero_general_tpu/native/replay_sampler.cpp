// Native batch assembler for the replay buffer.
//
// Computes, for a sampled batch, the stacked observations, n-step value
// targets (with per-player sign flips, reanalysed substitution, absorbing
// states), reward/policy/action targets and gradient scales in one pass —
// the TPU-native runtime counterpart of reference replay_buffer.py
// get_batch/make_target/compute_target_value (:70-138, :230-303), which the
// reference runs as a Python Ray actor.  Semantics are kept bit-compatible
// with muzero_general_tpu/replay.py (the pure-numpy fallback).
//
// Built as a CPython extension (see build.py); no pybind11 dependency.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct GameView {
  const float* observations;  // [L, C, H, W]
  const int32_t* actions;     // [L+1]
  const float* rewards;       // [L+1]
  const int32_t* to_play;     // [L+1]
  const float* child_visits;  // [L, A]
  const float* root_values;   // [L] (reanalysed already substituted)
  npy_intp L;
};

// n-step bootstrapped target value for one position (replay.py
// compute_target_values semantics; reference replay_buffer.py:230-262).
double target_value(const GameView& g, npy_intp index, int td_steps,
                    double discount) {
  const npy_intp L = g.L;
  double value = 0.0;
  const npy_intp boot = index + td_steps;
  if (boot < L && index < L) {
    const double bv = g.root_values[boot];
    const double signed_bv = (g.to_play[boot] == g.to_play[index]) ? bv : -bv;
    value = signed_bv * std::pow(discount, td_steps);
  }
  double disc = 1.0;
  for (int i = 0; i < td_steps; ++i) {
    const npy_intp r_idx = index + 1 + i;
    if (r_idx > L) break;
    const npy_intp p_idx = std::min(index + i, L);
    const double sign =
        (g.to_play[p_idx] == g.to_play[std::min(index, L)]) ? 1.0 : -1.0;
    value += sign * g.rewards[r_idx] * disc;
    disc *= discount;
  }
  return value;
}

bool get_f32(PyObject* seq, Py_ssize_t i, const float** out, npy_intp* dim0) {
  PyArrayObject* a = (PyArrayObject*)PySequence_GetItem(seq, i);
  if (!a) return false;
  if (!PyArray_Check(a) || PyArray_TYPE(a) != NPY_FLOAT32 ||
      !PyArray_IS_C_CONTIGUOUS(a)) {
    Py_DECREF(a);
    PyErr_SetString(PyExc_TypeError, "expected C-contiguous float32 array");
    return false;
  }
  *out = (const float*)PyArray_DATA(a);
  if (dim0) *dim0 = PyArray_DIM(a, 0);
  Py_DECREF(a);  // buffer stays alive via the caller-held list
  return true;
}

bool get_i32(PyObject* seq, Py_ssize_t i, const int32_t** out) {
  PyArrayObject* a = (PyArrayObject*)PySequence_GetItem(seq, i);
  if (!a) return false;
  if (!PyArray_Check(a) || PyArray_TYPE(a) != NPY_INT32 ||
      !PyArray_IS_C_CONTIGUOUS(a)) {
    Py_DECREF(a);
    PyErr_SetString(PyExc_TypeError, "expected C-contiguous int32 array");
    return false;
  }
  *out = (const int32_t*)PyArray_DATA(a);
  Py_DECREF(a);
  return true;
}

// assemble_batch(obs_list, act_list, rew_list, tp_list, cv_list, rv_list,
//                positions[i32 B], random_actions[i32 B,U+1],
//                U, td_steps, discount, A, n_stack, C, H, W,
//                out_obs, out_actions, out_values, out_rewards,
//                out_policies, out_grad_scale)
PyObject* assemble_batch(PyObject*, PyObject* args) {
  PyObject *obs_l, *act_l, *rew_l, *tp_l, *cv_l, *rv_l;
  PyArrayObject *positions, *rand_actions;
  int U, td_steps, A, n_stack, C, H, W;
  double discount;
  PyArrayObject *out_obs, *out_actions, *out_values, *out_rewards,
      *out_policies, *out_gs;
  if (!PyArg_ParseTuple(
          args, "OOOOOOO!O!iidiiiiiO!O!O!O!O!O!", &obs_l, &act_l, &rew_l, &tp_l,
          &cv_l, &rv_l, &PyArray_Type, &positions, &PyArray_Type,
          &rand_actions, &U, &td_steps, &discount, &A, &n_stack, &C, &H, &W,
          &PyArray_Type, &out_obs, &PyArray_Type, &out_actions, &PyArray_Type,
          &out_values, &PyArray_Type, &out_rewards, &PyArray_Type,
          &out_policies, &PyArray_Type, &out_gs))
    return nullptr;

  const Py_ssize_t B = PySequence_Size(obs_l);
  const int32_t* pos = (const int32_t*)PyArray_DATA(positions);
  const int32_t* rnd = (const int32_t*)PyArray_DATA(rand_actions);
  float* o_obs = (float*)PyArray_DATA(out_obs);
  int32_t* o_act = (int32_t*)PyArray_DATA(out_actions);
  float* o_val = (float*)PyArray_DATA(out_values);
  float* o_rew = (float*)PyArray_DATA(out_rewards);
  float* o_pol = (float*)PyArray_DATA(out_policies);
  float* o_gs = (float*)PyArray_DATA(out_gs);

  const npy_intp plane = (npy_intp)H * W;
  const npy_intp obs_stride = ((npy_intp)C * (n_stack + 1) + n_stack) * plane;
  const int UP1 = U + 1;
  const float uniform = 1.0f / A;

  for (Py_ssize_t b = 0; b < B; ++b) {
    GameView g;
    if (!get_f32(obs_l, b, &g.observations, &g.L)) return nullptr;
    if (!get_i32(act_l, b, &g.actions)) return nullptr;
    if (!get_f32(rew_l, b, &g.rewards, nullptr)) return nullptr;
    if (!get_i32(tp_l, b, &g.to_play)) return nullptr;
    if (!get_f32(cv_l, b, &g.child_visits, nullptr)) return nullptr;
    if (!get_f32(rv_l, b, &g.root_values, nullptr)) return nullptr;
    const npy_intp p = pos[b];
    const npy_intp L = g.L;

    // ---- stacked observation (reference self_play.py:513-550) ----------
    float* dst = o_obs + b * obs_stride;
    std::copy(g.observations + p * C * plane,
              g.observations + (p + 1) * C * plane, dst);
    dst += (npy_intp)C * plane;
    for (int k = 1; k <= n_stack; ++k) {
      const npy_intp past = p - k;
      if (past >= 0) {
        std::copy(g.observations + past * C * plane,
                  g.observations + (past + 1) * C * plane, dst);
        dst += (npy_intp)C * plane;
        const float v = (float)g.actions[past + 1] / A;
        std::fill(dst, dst + plane, v);
        dst += plane;
      } else {
        std::fill(dst, dst + (npy_intp)(C + 1) * plane, 0.0f);
        dst += (npy_intp)(C + 1) * plane;
      }
    }

    // ---- targets (reference replay_buffer.py:264-303) ------------------
    const float gs = (float)std::min((npy_intp)U, L + 1 - p);
    for (int u = 0; u < UP1; ++u) {
      const npy_intp idx = p + u;
      const npy_intp o = b * UP1 + u;
      o_gs[o] = gs;
      if (idx < L) {
        o_val[o] = (float)target_value(g, idx, td_steps, discount);
        o_rew[o] = g.rewards[idx];
        std::copy(g.child_visits + idx * A, g.child_visits + (idx + 1) * A,
                  o_pol + o * A);
        o_act[o] = g.actions[idx];
      } else if (idx == L) {
        o_val[o] = 0.0f;
        o_rew[o] = g.rewards[idx];
        std::fill(o_pol + o * A, o_pol + (o + 1) * A, uniform);
        o_act[o] = g.actions[idx];
      } else {
        o_val[o] = 0.0f;
        o_rew[o] = 0.0f;
        std::fill(o_pol + o * A, o_pol + (o + 1) * A, uniform);
        o_act[o] = rnd[o];
      }
    }
  }
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"assemble_batch", assemble_batch, METH_VARARGS,
     "Fill batch target arrays from sampled games."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_replay_native", nullptr, -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__replay_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
