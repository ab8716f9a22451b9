// CPython extension wrapper for the hot single-pair entry point.
//
// ctypes adds ~10us per call (argument marshalling) — measurable against
// the reference's ~5us total at tiny inputs.  This thin METH_FASTCALL
// wrapper drops FFI overhead to ~0.5us.  Built alongside the ctypes .so;
// the loader prefers it and falls back transparently.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <memory>
#include <vector>

extern "C" int etn_align(const uint8_t*, int64_t, const uint8_t*, int64_t,
                         int, int, int64_t, const uint8_t*, const uint8_t*,
                         int64_t, int32_t*, int32_t*, int32_t*, int64_t*,
                         int32_t*);

// align(query: bytes, target: bytes, mode: int, want_starts: int, k: int,
//       eq_first: bytes|None, eq_second: bytes|None)
//   -> (edit_distance, alphabet_len, ends: list[int], starts: list[int]|None)
//   or None when the alphabet exceeds the native limit (caller falls back).
static PyObject* py_align(PyObject* self, PyObject* const* args,
                          Py_ssize_t nargs) {
    if (nargs != 7) {
        PyErr_SetString(PyExc_TypeError, "align expects 7 arguments");
        return nullptr;
    }
    Py_buffer q{}, t{}, ea{}, eb{};
    if (PyObject_GetBuffer(args[0], &q, PyBUF_SIMPLE) < 0) return nullptr;
    if (PyObject_GetBuffer(args[1], &t, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&q);
        return nullptr;
    }
    long mode = PyLong_AsLong(args[2]);
    long want_starts = PyLong_AsLong(args[3]);
    long long k = PyLong_AsLongLong(args[4]);
    const uint8_t* eq_a = nullptr;
    const uint8_t* eq_b = nullptr;
    int64_t n_eq = 0;
    bool have_ea = args[5] != Py_None, have_eb = args[6] != Py_None;
    if (have_ea && PyObject_GetBuffer(args[5], &ea, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&q); PyBuffer_Release(&t);
        return nullptr;
    }
    if (have_eb && PyObject_GetBuffer(args[6], &eb, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&q); PyBuffer_Release(&t);
        if (have_ea) PyBuffer_Release(&ea);
        return nullptr;
    }
    if (have_ea) {
        eq_a = (const uint8_t*)ea.buf;
        eq_b = (const uint8_t*)eb.buf;
        n_eq = ea.len;
    }

    int32_t dist = -1, alpha = 0;
    int64_t n_locs = 0;
    // Uninitialized buffers (value-init would memset ~8MB/Mbp per call).
    std::unique_ptr<int32_t[]> ends(new int32_t[(size_t)t.len + 1]);
    std::unique_ptr<int32_t[]> starts(new int32_t[(size_t)t.len + 1]);
    int rc;
    Py_BEGIN_ALLOW_THREADS
    rc = etn_align((const uint8_t*)q.buf, q.len, (const uint8_t*)t.buf,
                   t.len, (int)mode, (int)want_starts, k, eq_a, eq_b, n_eq,
                   &dist, &alpha, ends.get(), &n_locs, starts.get());
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&q);
    PyBuffer_Release(&t);
    if (have_ea) PyBuffer_Release(&ea);
    if (have_eb) PyBuffer_Release(&eb);
    if (rc != 0) Py_RETURN_NONE;

    PyObject* ends_list = PyList_New(n_locs);
    if (!ends_list) return nullptr;
    for (int64_t i = 0; i < n_locs; i++) {
        PyObject* v = PyLong_FromLong(ends[i]);
        if (!v) { Py_DECREF(ends_list); return nullptr; }
        PyList_SET_ITEM(ends_list, i, v);
    }
    PyObject* starts_obj;
    if (want_starts) {
        starts_obj = PyList_New(n_locs);
        if (!starts_obj) { Py_DECREF(ends_list); return nullptr; }
        for (int64_t i = 0; i < n_locs; i++) {
            PyObject* v = PyLong_FromLong(starts[i]);
            if (!v) { Py_DECREF(ends_list); Py_DECREF(starts_obj);
                      return nullptr; }
            PyList_SET_ITEM(starts_obj, i, v);
        }
    } else {
        starts_obj = Py_None;
        Py_INCREF(Py_None);
    }
    // "N" steals ends_list/starts_obj on success AND on failure.
    return Py_BuildValue("(iiNN)", (int)dist, (int)alpha,
                         ends_list, starts_obj);
}

static PyMethodDef methods[] = {
    {"align", (PyCFunction)py_align, METH_FASTCALL,
     "Single-pair edit-distance alignment (native fast path)."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_edlib_tpu_native_ext",
    "Native fast-path extension for edlib_tpu.", -1, methods,
};

PyMODINIT_FUNC PyInit__edlib_tpu_native_ext(void) {
    return PyModule_Create(&moduledef);
}
