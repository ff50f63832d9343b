// Embedded-style demo: allocation-free TVLQR solve on the double
// integrator (the workload of the reference's embedded target), with all
// memory statically sized up front — build with `make`, run build/demo.

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
size_t altro_tvlqr_work_size(int n, int m);
int altro_tvlqr_backward(int n, int m, int N, const double* A, const double* B,
                         const double* f, const double* lxx, const double* luu,
                         const double* lux, const double* lx, const double* lu,
                         double reg, double* K, double* d, double* P, double* p,
                         double* dV, double* work);
int altro_tvlqr_forward(int n, int m, int N, const double* A, const double* B,
                        const double* f, const double* K, const double* d,
                        const double* P, const double* p, const double* x0,
                        double* x, double* u, double* y);
}

int main() {
  constexpr int dim = 2, n = 2 * dim, m = dim, N = 100;
  const double h = 0.01;

  std::vector<double> A(N * n * n, 0), B(N * n * m, 0), f(N * n, 0);
  std::vector<double> lxx((N + 1) * n * n, 0), luu(N * m * m, 0), lux(N * m * n, 0);
  std::vector<double> lx((N + 1) * n, 0.01), lu(N * m, 0.001);
  for (int k = 0; k < N; ++k) {
    double* Ak = A.data() + k * n * n;
    double* Bk = B.data() + k * n * m;
    for (int i = 0; i < n; ++i) Ak[i * n + i] = 1.0;
    for (int i = 0; i < dim; ++i) {
      Ak[i * n + i + dim] = h;
      Bk[i * m + i] = 0.5 * h * h;
      Bk[(i + dim) * m + i] = h;
    }
    double* Q = lxx.data() + k * n * n;
    double* R = luu.data() + k * m * m;
    for (int i = 0; i < n; ++i) Q[i * n + i] = 1.1;
    for (int i = 0; i < m; ++i) R[i * m + i] = 0.1;
  }
  double* QN = lxx.data() + N * n * n;
  for (int i = 0; i < n; ++i) QN[i * n + i] = 110.0;

  std::vector<double> K(N * m * n), d(N * m), P((N + 1) * n * n), p((N + 1) * n);
  std::vector<double> x((N + 1) * n), u(N * m), y((N + 1) * n);
  double dV[2];
  std::vector<double> work(altro_tvlqr_work_size(n, m) / sizeof(double));
  const double x0[n] = {10.5, -20.5, -4.0, 5.0};

  const int iters = 10000;
  auto t0 = std::chrono::high_resolution_clock::now();
  int res = 0;
  for (int it = 0; it < iters; ++it) {
    res = altro_tvlqr_backward(n, m, N, A.data(), B.data(), f.data(), lxx.data(),
                               luu.data(), lux.data(), lx.data(), lu.data(), 0.0,
                               K.data(), d.data(), P.data(), p.data(), dV,
                               work.data());
    altro_tvlqr_forward(n, m, N, A.data(), B.data(), f.data(), K.data(), d.data(),
                        P.data(), p.data(), x0, x.data(), u.data(), y.data());
  }
  auto t1 = std::chrono::high_resolution_clock::now();
  double us =
      std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count() /
      double(iters);
  std::printf("tvlqr backward+forward (n=%d m=%d N=%d): %.1f us/solve, res=%d\n",
              n, m, N, us, res);
  std::printf("xN = [%g %g %g %g]\n", x[N * n], x[N * n + 1], x[N * n + 2],
              x[N * n + 3]);
  return 0;
}
