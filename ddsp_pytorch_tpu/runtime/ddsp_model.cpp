/* ddsp_model.cpp — CPython-embedded bundle host (see ddsp_model.h). */

#include "ddsp_model.h"

#include <Python.h>

#ifndef _WIN32
#include <dlfcn.h>
#endif

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

namespace {

bool g_initialized = false;

/* When this library arrives via dlopen (a Pd external loads ddsp~.pd_linux
 * which depends on us), libpython is loaded RTLD_LOCAL and CPython's own
 * extension modules (math, _datetime, numpy's C core, ...) then fail with
 * "undefined symbol: PyFloat_Type".  Re-opening the already-loaded
 * libpython with RTLD_GLOBAL|RTLD_NOLOAD promotes its symbols before the
 * interpreter starts importing.  No-op when Python symbols live in the
 * executable (ctypes / ddsp_host). */
void promote_libpython_symbols() {
#ifndef _WIN32
  Dl_info info;
  if (dladdr(reinterpret_cast<void *>(&Py_InitializeEx), &info) &&
      info.dli_fname) {
    dlopen(info.dli_fname, RTLD_NOW | RTLD_GLOBAL | RTLD_NOLOAD);
  }
#endif
}

/* Directory of this shared library (empty if unknown) — used to derive the
 * repo root so an in-tree build of ddsp~ finds the package without any
 * environment setup. */
std::string self_library_dir() {
#ifndef _WIN32
  Dl_info info;
  if (dladdr(reinterpret_cast<void *>(&ddsp_model_load), &info) &&
      info.dli_fname) {
    std::string p(info.dli_fname);
    auto cut = p.find_last_of('/');
    if (cut != std::string::npos) return p.substr(0, cut);
  }
#endif
  return "";
}

void sys_path_insert(const std::string &path) {
  if (path.empty()) return;
  PyObject *sys_path = PySys_GetObject("path");  // borrowed
  PyObject *p = PyUnicode_FromString(path.c_str());
  if (sys_path && p) PyList_Insert(sys_path, 0, p);
  Py_XDECREF(p);
}

void print_py_error(const char *where) {
  std::fprintf(stderr, "[ddsp_model] python error in %s:\n", where);
  PyErr_Print();
}

struct Model {
  PyObject *synth = nullptr;       // stream session (export.make_stream_session)
  PyObject *step_fn = nullptr;     // bound step_samples
  int block_size = -1;
  int sample_rate = -1;
  bool needs_audio = false;        // mfcc-autoencoder session
};

}  // namespace

extern "C" {

int ddsp_runtime_init(const char *extra_sys_path) {
  if (g_initialized) return 0;
  bool fresh = false;
  if (!Py_IsInitialized()) {
    promote_libpython_symbols();
    Py_InitializeEx(0);
    fresh = true;
  }
  PyGILState_STATE gil = PyGILState_Ensure();
  // Each insert lands at sys.path[0], so add in INCREASING priority:
  // in-tree fallback first, then DDSP_PYTHONPATH, then the caller's
  // explicit extra_sys_path (the most explicit request must win).
  //
  // In-tree convenience: this library lives at
  // <repo>/ddsp_pytorch_tpu/runtime/build/libddsp_model.so — put <repo> on
  // sys.path so `import ddsp_pytorch_tpu` works with zero configuration.
  // Only added when that ancestor actually contains the package: for an
  // installed .so (e.g. ~/pd/externals/) "3 dirs up" is an arbitrary
  // directory (often $HOME) where stray user modules would shadow stdlib
  // packages.
  {
    std::string dir = self_library_dir();
    for (int up = 0; up < 3 && !dir.empty(); ++up) {
      auto cut = dir.find_last_of('/');
      dir = (cut == std::string::npos) ? "" : dir.substr(0, cut);
    }
    if (!dir.empty()) {
      std::string marker = dir + "/ddsp_pytorch_tpu/__init__.py";
      if (FILE *f = std::fopen(marker.c_str(), "r")) {
        std::fclose(f);
        sys_path_insert(dir);
      }
    }
  }
  // DDSP_PYTHONPATH: explicit package location (the Pd external has no way
  // to pass extra_sys_path from a patch).
  if (const char *env_path = std::getenv("DDSP_PYTHONPATH")) {
    sys_path_insert(env_path);
  }
  if (extra_sys_path && *extra_sys_path) {
    sys_path_insert(extra_sys_path);
  }
  // DDSP_PLATFORM=cpu|tpu|... selects the JAX backend before first backend
  // init.  (A plain JAX_PLATFORMS env var can be overridden by a
  // sitecustomize jax.config.update; doing the config.update here wins.)
  if (const char *plat = std::getenv("DDSP_PLATFORM")) {
    std::string code = "import jax; jax.config.update('jax_platforms', '";
    code += plat;
    code += "')";
    if (PyRun_SimpleString(code.c_str()) != 0) {
      std::fprintf(stderr, "[ddsp_model] DDSP_PLATFORM=%s failed\n", plat);
    }
  }
  g_initialized = true;
  PyGILState_Release(gil);
  // Only a fresh Py_InitializeEx leaves this thread holding the GIL (main
  // thread state current) — release it so worker threads can acquire.
  // When the interpreter was already live (host embeds Python, or this
  // library is driven via ctypes), PyGILState_Release above restored the
  // caller's state and the current tstate may be NULL: PyEval_SaveThread
  // would Py_FatalError the whole host process.
  if (fresh) PyEval_SaveThread();
  return 0;
}

ddsp_model *ddsp_model_load(const char *bundle_dir) {
  if (!g_initialized) {
    std::fprintf(stderr, "[ddsp_model] call ddsp_runtime_init first\n");
    return nullptr;
  }
  PyGILState_STATE gil = PyGILState_Ensure();
  Model *m = new Model();
  PyObject *mod = nullptr, *fn = nullptr, *synth = nullptr;

  mod = PyImport_ImportModule("ddsp_pytorch_tpu.export");
  if (!mod) goto fail;
  fn = PyObject_GetAttrString(mod, "make_stream_session");
  if (!fn) goto fail;
  synth = PyObject_CallFunction(fn, "s", bundle_dir);
  if (!synth) goto fail;

  m->synth = synth;
  m->step_fn = PyObject_GetAttrString(synth, "step_samples");
  if (!m->step_fn) goto fail;
  {
    PyObject *bs = PyObject_GetAttrString(synth, "block_size");
    PyObject *sr = PyObject_GetAttrString(synth, "sample_rate");
    PyObject *na = PyObject_GetAttrString(synth, "needs_audio");
    if (bs) m->block_size = (int)PyLong_AsLong(bs);
    if (sr) m->sample_rate = (int)PyLong_AsLong(sr);
    if (na) m->needs_audio = PyObject_IsTrue(na) == 1;
    Py_XDECREF(bs);
    Py_XDECREF(sr);
    Py_XDECREF(na);
  }
  Py_XDECREF(fn);
  Py_XDECREF(mod);
  PyGILState_Release(gil);
  return reinterpret_cast<ddsp_model *>(m);

fail:
  print_py_error("ddsp_model_load");
  Py_XDECREF(synth);
  Py_XDECREF(fn);
  Py_XDECREF(mod);
  delete m;
  PyGILState_Release(gil);
  return nullptr;
}

void ddsp_model_free(ddsp_model *model) {
  auto *m = reinterpret_cast<Model *>(model);
  if (!m) return;
  PyGILState_STATE gil = PyGILState_Ensure();
  Py_XDECREF(m->step_fn);
  Py_XDECREF(m->synth);
  PyGILState_Release(gil);
  delete m;
}

namespace {

// Shared perform path; audio_in may be NULL (decoder sessions).
int perform_impl(Model *m, const float *pitch, const float *loudness,
                 const float *audio_in, float *out, int n) {
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = -1;
  // Build (1, n) float32 memoryview-backed arrays via numpy frombuffer to
  // avoid a dependency on the numpy C API headers.
  PyObject *np = nullptr, *frombuffer = nullptr;
  PyObject *pitch_arr = nullptr, *loud_arr = nullptr, *audio_arr = nullptr,
           *result = nullptr;
  PyObject *audio_np = nullptr;
  PyObject *mv_pitch = nullptr, *mv_loud = nullptr, *mv_audio = nullptr,
           *bytes_obj = nullptr;

  np = PyImport_ImportModule("numpy");
  if (!np) goto done;
  frombuffer = PyObject_GetAttrString(np, "frombuffer");
  if (!frombuffer) goto done;

  mv_pitch = PyMemoryView_FromMemory(
      reinterpret_cast<char *>(const_cast<float *>(pitch)),
      n * sizeof(float), PyBUF_READ);
  mv_loud = PyMemoryView_FromMemory(
      reinterpret_cast<char *>(const_cast<float *>(loudness)),
      n * sizeof(float), PyBUF_READ);
  if (!mv_pitch || !mv_loud) goto done;

  pitch_arr = PyObject_CallFunction(frombuffer, "Os", mv_pitch, "float32");
  loud_arr = PyObject_CallFunction(frombuffer, "Os", mv_loud, "float32");
  if (!pitch_arr || !loud_arr) goto done;
  if (audio_in) {
    mv_audio = PyMemoryView_FromMemory(
        reinterpret_cast<char *>(const_cast<float *>(audio_in)),
        n * sizeof(float), PyBUF_READ);
    if (!mv_audio) goto done;
    audio_arr = PyObject_CallFunction(frombuffer, "Os", mv_audio, "float32");
    if (!audio_arr) goto done;
  }

  {
    PyObject *shaped_p = PyObject_CallMethod(pitch_arr, "reshape", "ii", 1, n);
    PyObject *shaped_l = PyObject_CallMethod(loud_arr, "reshape", "ii", 1, n);
    PyObject *shaped_a =
        audio_arr ? PyObject_CallMethod(audio_arr, "reshape", "ii", 1, n)
                  : nullptr;
    if (!shaped_p || !shaped_l || (audio_arr && !shaped_a)) {
      Py_XDECREF(shaped_p);
      Py_XDECREF(shaped_l);
      Py_XDECREF(shaped_a);
      goto done;
    }
    result = shaped_a
                 ? PyObject_CallFunctionObjArgs(m->step_fn, shaped_p, shaped_l,
                                                shaped_a, NULL)
                 : PyObject_CallFunctionObjArgs(m->step_fn, shaped_p, shaped_l,
                                                NULL);
    Py_DECREF(shaped_p);
    Py_DECREF(shaped_l);
    Py_XDECREF(shaped_a);
  }
  if (!result) goto done;

  // numpy.asarray(result, dtype=float32).tobytes() → memcpy out
  audio_np = PyObject_CallMethod(np, "asarray", "Os", result, "float32");
  if (!audio_np) goto done;
  bytes_obj = PyObject_CallMethod(audio_np, "tobytes", NULL);
  if (!bytes_obj) goto done;
  {
    char *buf = nullptr;
    Py_ssize_t len = 0;
    if (PyBytes_AsStringAndSize(bytes_obj, &buf, &len) != 0) goto done;
    if (len < (Py_ssize_t)(n * sizeof(float))) goto done;
    std::memcpy(out, buf, n * sizeof(float));
  }
  rc = 0;

done:
  if (rc != 0) print_py_error("ddsp_model_perform");
  Py_XDECREF(bytes_obj);
  Py_XDECREF(audio_np);
  Py_XDECREF(result);
  Py_XDECREF(pitch_arr);
  Py_XDECREF(loud_arr);
  Py_XDECREF(audio_arr);
  Py_XDECREF(mv_pitch);
  Py_XDECREF(mv_loud);
  Py_XDECREF(mv_audio);
  Py_XDECREF(frombuffer);
  Py_XDECREF(np);
  PyGILState_Release(gil);
  return rc;
}

}  // namespace

int ddsp_model_perform(ddsp_model *model, const float *pitch,
                       const float *loudness, float *out, int n) {
  auto *m = reinterpret_cast<Model *>(model);
  if (!m || n <= 0 || (m->block_size > 0 && n % m->block_size != 0)) return -1;
  if (m->needs_audio) {
    std::fprintf(stderr,
                 "[ddsp_model] mfcc-autoencoder bundle: use "
                 "ddsp_model_perform_audio\n");
    return -1;
  }
  return perform_impl(m, pitch, loudness, nullptr, out, n);
}

int ddsp_model_perform_audio(ddsp_model *model, const float *pitch,
                             const float *loudness, const float *audio,
                             float *out, int n) {
  auto *m = reinterpret_cast<Model *>(model);
  if (!m || n <= 0 || (m->block_size > 0 && n % m->block_size != 0)) return -1;
  if (!m->needs_audio)  // decoder sessions ignore the audio channel
    return perform_impl(m, pitch, loudness, nullptr, out, n);
  if (!audio) return -1;
  return perform_impl(m, pitch, loudness, audio, out, n);
}

int ddsp_model_needs_audio(const ddsp_model *model) {
  auto *m = reinterpret_cast<const Model *>(model);
  return m ? (m->needs_audio ? 1 : 0) : -1;
}

int ddsp_model_block_size(const ddsp_model *model) {
  auto *m = reinterpret_cast<const Model *>(model);
  return m ? m->block_size : -1;
}

int ddsp_model_sample_rate(const ddsp_model *model) {
  auto *m = reinterpret_cast<const Model *>(model);
  return m ? m->sample_rate : -1;
}

}  // extern "C"
